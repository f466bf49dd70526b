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
