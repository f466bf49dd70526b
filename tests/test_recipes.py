import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.train import TrainState, make_train_step
from advancedliteratemachinery_tpu.engine.train_extras import (
    MutableTrainState,
    make_mutable_train_step,
)
from advancedliteratemachinery_tpu.engine.recipes import (
    db_recipe,
    lister_recipe,
    omniparser_recipe,
)
from advancedliteratemachinery_tpu.parallel.mesh import batch_sharding, create_mesh


class TestListerRecipe:
    def test_trains(self):
        from advancedliteratemachinery_tpu.codecs.seq_codec import EosSeqCodec
        from advancedliteratemachinery_tpu.models.lister import LISTER, LISTERConfig

        mesh = create_mesh(data=4, fsdp=2)
        cfg = LISTERConfig(variant="tiny", max_ch=8, iters=0, drop_path_rate=0.0)
        model = LISTER(cfg, policy=FP32_POLICY)
        codec = EosSeqCodec(max_ch=cfg.max_ch)
        ids, lens = codec.encode(["ab", "hello", "x", "test"] * 2)
        batch = {
            "images": jax.random.normal(jax.random.PRNGKey(0), (8, 32, 48, 3)),
            "mask": jnp.ones((8, 32, 48)),
            "labels": jnp.asarray(ids),
            "label_lens": jnp.asarray(lens, jnp.float32),
        }
        params = model.init(jax.random.PRNGKey(1), batch["images"][:1],
                            batch["mask"][:1], train=True)["params"]
        loss_fn, tx = lister_recipe(model, cfg)
        state = TrainState.create(params, tx)
        step, shardings = make_train_step(loss_fn, state, mesh)
        state = jax.device_put(state, shardings)
        batch = jax.device_put(batch, batch_sharding(mesh))
        losses = []
        for i in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]


class TestOmniParserRecipe:
    def test_trains(self):
        from advancedliteratemachinery_tpu.models.omniparser import (
            OmniParser,
            OmniParserConfig,
        )

        mesh = create_mesh(data=4, fsdp=2)
        cfg = OmniParserConfig(
            swin_variant="tiny", d_model=32, nhead=2, dec_layers=1,
            dim_feedforward=64, num_bins=20, chars="ab",
            max_position_embeddings=32, drop_path_rate=0.0)
        model = OmniParser(cfg, policy=FP32_POLICY)
        v = cfg.vocab()
        rng = np.random.default_rng(0)
        B = 8
        batch = {
            "images": jax.random.normal(jax.random.PRNGKey(0), (B, 64, 64, 3)),
        }
        for task, L in (("pt", 6), ("poly", 5), ("rec", 5)):
            batch[f"{task}_in"] = jnp.asarray(
                rng.integers(0, 20, (B, L)), jnp.int32)
            batch[f"{task}_out"] = jnp.asarray(
                rng.integers(0, 20, (B, L)), jnp.int32)
        seqs = {"pt": batch["pt_in"], "poly": batch["poly_in"],
                "rec": batch["rec_in"]}
        params = model.init(jax.random.PRNGKey(1), batch["images"][:1],
                            jax.tree.map(lambda x: x[:1], seqs))["params"]
        loss_fn, tx = omniparser_recipe(model, v.padding_index)
        state = TrainState.create(params, tx)
        step, shardings = make_train_step(loss_fn, state, mesh)
        state = jax.device_put(state, shardings)
        batch = jax.device_put(batch, batch_sharding(mesh))
        state, m = step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(m["loss"]))
        assert float(m["rec_loss"]) > 0


class TestDBRecipe:
    def test_trains_with_bn(self):
        from advancedliteratemachinery_tpu.models.db import DBConfig, DBDetector

        mesh = create_mesh(data=4, fsdp=2)
        model = DBDetector(DBConfig(width=8, fpn_dim=16, head_dim=8),
                           policy=FP32_POLICY)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3))
        vars_ = model.init(jax.random.PRNGKey(1), x, train=True)
        batch = {
            "images": x,
            "gt_prob": (jax.random.uniform(jax.random.PRNGKey(2),
                                           (8, 32, 32, 1)) > 0.8).astype(jnp.float32),
            "gt_thresh": jnp.full((8, 32, 32, 1), 0.3),
        }
        loss_fn, tx = db_recipe(model)
        state = MutableTrainState.create(vars_["params"], vars_["batch_stats"], tx)
        step, shardings = make_mutable_train_step(loss_fn, state, mesh)
        state = jax.device_put(state, shardings)
        batch = jax.device_put(batch, batch_sharding(mesh))
        losses = []
        for i in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]


class TestGeoLayoutLMRecipe:
    def test_trains(self):
        from advancedliteratemachinery_tpu.engine.recipes import (
            geolayoutlm_recipe)
        from advancedliteratemachinery_tpu.models.bros import BrosConfig
        from advancedliteratemachinery_tpu.models.convnext import ConvNeXtConfig
        from advancedliteratemachinery_tpu.models.geolayoutlm import (
            GeoLayoutLM, GeoLayoutLMConfig)

        mesh = create_mesh(data=4, fsdp=2)
        bros = BrosConfig(vocab_size=60, hidden_size=32, num_hidden_layers=1,
                          num_attention_heads=2, intermediate_size=64,
                          max_position_embeddings=16,
                          coordinate_size=6, shape_size=4)
        cfg = GeoLayoutLMConfig(
            bros=bros, convnext=ConvNeXtConfig(depths=(1, 1, 1, 1),
                                               dims=(8, 16, 32, 64)),
            n_classes=5, vis_channels=16, max_rel_enc=8)
        model = GeoLayoutLM(cfg, policy=FP32_POLICY)
        rng = np.random.default_rng(0)
        B, S, N = 8, 8, 3
        batch = {
            "input_ids": jnp.asarray(rng.integers(0, 60, (B, S)), jnp.int32),
            "image": jnp.asarray(
                rng.integers(0, 255, (B, 64, 64, 3)).astype(np.float32)),
            "bbox_4p_normalized": jnp.asarray(
                rng.random((B, S, 8)), jnp.float32),
            "bbox": jnp.asarray(np.sort(
                rng.integers(0, 500, (B, S, 2, 2)), axis=3)
                .transpose(0, 1, 3, 2).reshape(B, S, 4).astype(np.int32)),
            "attention_mask": jnp.ones((B, S)),
            "first_token_idxes": jnp.asarray(
                rng.integers(0, S, (B, N)), jnp.int32),
            "block_mask": jnp.ones((B, N)),
            "bio_labels": jnp.asarray(rng.integers(0, 5, (B, S)), jnp.int32),
            "el_labels_blk": jnp.asarray(
                rng.integers(0, 2, (B, N, N)).astype(np.float32)),
            "el_label_blk_mask": jnp.ones((B, N, N)),
        }
        params = model.init(
            jax.random.PRNGKey(0),
            jax.tree.map(lambda a: a[:1], batch))["params"]
        loss_fn, tx = geolayoutlm_recipe(model)
        state = TrainState.create(params, tx)
        step, shardings = make_train_step(loss_fn, state, mesh)
        state = jax.device_put(state, shardings)
        batch = jax.device_put(batch, batch_sharding(mesh))
        losses = []
        for i in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]


class TestSmallRecipes:
    def test_vlpt_trains(self):
        from advancedliteratemachinery_tpu.engine.recipes import vlpt_recipe
        from advancedliteratemachinery_tpu.models.vlpt import VLPT, VLPTConfig

        mesh = create_mesh(data=4, fsdp=2)
        cfg = VLPTConfig(embed_dim=32, vocab_size=200, max_text_len=16,
                         image_size=64, image_depth=1, text_depth=1,
                         co_depth=1, heads=2, fpn_dim=8, resnet_base=4,
                         resnet_blocks=(1, 1, 1, 1), false_text_length=8)
        model = VLPT(cfg, policy=FP32_POLICY)
        rng = np.random.default_rng(0)
        B, T = 8, 16
        ids = rng.integers(4, 200, (B, T))
        labels = np.full((B, T), -100)
        labels[:, 3] = ids[:, 3]
        ids_mlm = ids.copy()
        ids_mlm[:, 3] = 1
        batch = {
            "image": jnp.asarray(rng.standard_normal((B, 64, 64, 3)),
                                 jnp.float32),
            "text_ids": jnp.asarray(ids, jnp.int32),
            "text_ids_mlm": jnp.asarray(ids_mlm, jnp.int32),
            "text_labels_mlm": jnp.asarray(labels, jnp.int32),
            "text_masks": jnp.ones((B, T), jnp.int32),
        }
        vars_ = model.init(jax.random.PRNGKey(0),
                           jax.tree.map(lambda a: a[:2], batch), train=True)
        loss_fn, tx = vlpt_recipe(model)
        state = MutableTrainState.create(vars_["params"],
                                         vars_["batch_stats"], tx)
        step, shardings = make_mutable_train_step(loss_fn, state, mesh)
        state = jax.device_put(state, shardings)
        batch = jax.device_put(batch, batch_sharding(mesh))
        state, m = step(state, batch, jax.random.PRNGKey(5))
        assert np.isfinite(float(m["loss"]))

    def test_trcg_lora_trains_and_freezes_base(self):
        from advancedliteratemachinery_tpu.engine.recipes import trcg_recipe
        from advancedliteratemachinery_tpu.models.trcg import TRCG, TRCGConfig
        from advancedliteratemachinery_tpu.models.vit import ViTConfig

        mesh = create_mesh(data=4, fsdp=2)
        cfg = TRCGConfig(vocab_size=120, hidden_size=32, num_layers=1,
                         heads=2, lora_rank=4,
                         vision=ViTConfig(img_size=(32, 32), patch_size=16,
                                          embed_dim=32, depth=1, num_heads=2,
                                          apply_final_norm=True))
        model = TRCG(cfg, policy=FP32_POLICY)
        rng = np.random.default_rng(0)
        batch = {
            "images": jnp.asarray(rng.standard_normal((8, 32, 32, 3)),
                                  jnp.float32),
            "input_ids": jnp.asarray(rng.integers(0, 120, (8, 10)), jnp.int32),
        }
        params = model.init(jax.random.PRNGKey(0), batch["images"][:1],
                            batch["input_ids"][:1])["params"]
        n_img = (32 // 16) ** 2
        loss_fn, tx = trcg_recipe(model, n_img)
        state = TrainState.create(params, tx)
        step, shardings = make_train_step(loss_fn, state, mesh)
        state = jax.device_put(state, shardings)
        batch = jax.device_put(batch, batch_sharding(mesh))
        before = jax.tree.map(np.asarray, state.params)
        state, m = step(state, batch, jax.random.PRNGKey(0))
        after = jax.tree.map(np.asarray, state.params)
        assert np.isfinite(float(m["loss"]))
        # base weights frozen, LoRA adapters moved
        flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
        flat_a = {tuple(str(getattr(k, "key", k)) for k in p): v
                  for p, v in jax.tree_util.tree_flatten_with_path(after)[0]}
        moved_lora, frozen_base = 0, True
        for path, vb in flat_b:
            key = tuple(str(getattr(k, "key", k)) for k in path)
            va = flat_a[key]
            is_lora = any("lora" in k for k in key)
            if is_lora and not np.allclose(vb, va):
                moved_lora += 1
            if not is_lora and not np.allclose(vb, va):
                frozen_base = False
        assert moved_lora > 0 and frozen_base


class TestWebRPGRecipe:
    def test_trains_with_frozen_vae(self):
        from advancedliteratemachinery_tpu.engine.recipes import webrpg_recipe
        from advancedliteratemachinery_tpu.models.webrpg import (
            WebRPGConfig, WebRPGModel)

        mesh = create_mesh(data=4, fsdp=2)
        cfg = WebRPGConfig(param_vocab=32, parameters_len=6, latent_dim=8,
                           vae_hidden=(8, 16), embed_dim=16, enc_layers=1,
                           dec_layers=1, heads=2, global_text_dim=8,
                           element_text_dim=8, xpath_dim=8, chrlen_vocab=64)
        model = WebRPGModel(cfg, policy=FP32_POLICY)
        rng = np.random.default_rng(0)
        B, N = 8, 5
        batch = {
            "param_ids": jnp.asarray(rng.integers(0, 32, (B, N, 6)), jnp.int32),
            "global_text": jnp.asarray(rng.standard_normal((B, 1, 8)),
                                       jnp.float32),
            "element_text": jnp.asarray(rng.standard_normal((B, N, 8)),
                                        jnp.float32),
            "chrlen": jnp.asarray(rng.integers(0, 64, (B, N)), jnp.int32),
            "xpath": jnp.asarray(rng.standard_normal((B, N, 8)), jnp.float32),
            "element_mask": jnp.ones((B, N), jnp.int32),
        }
        params = model.init(jax.random.PRNGKey(0),
                            jax.tree.map(lambda a: a[:2], batch),
                            jax.random.PRNGKey(1))["params"]
        loss_fn, tx = webrpg_recipe(model, cfg)
        state = TrainState.create(params, tx)
        step, shardings = make_train_step(loss_fn, state, mesh)
        state = jax.device_put(state, shardings)
        batch = jax.device_put(batch, batch_sharding(mesh))
        vae_before = np.asarray(jax.tree.leaves(params["vae"])[0])
        K = jax.random.PRNGKey(7)  # fixed rng: deterministic VAE target
        ar = []
        for _ in range(500):
            state, m = step(state, batch, K)
            ar.append(float(m["ar_loss"]))
        vae_after = np.asarray(
            jax.tree.leaves(jax.device_get(state.params)["vae"])[0])
        assert np.array_equal(vae_before, vae_after)   # reference: VAE frozen
        assert ar[-1] < ar[0] and np.isfinite(ar).all()
