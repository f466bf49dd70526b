"""SceneVTG training paths: LVTR diffusion batches (manifest-driven
renderer data, frozen ExCTC OCR loss — reference train_lvtr.py) and TRCG
LoRA finetune batches (pre-tokenized multimodal records — reference
llava/train/train.py), both through fit()."""

import json

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine import batches as B
from advancedliteratemachinery_tpu.engine.fit import FitConfig, fit
from advancedliteratemachinery_tpu.engine.recipes import (
    lvtr_recipe,
    trcg_recipe,
)
from advancedliteratemachinery_tpu.models.lvtr import (
    ExCTC,
    LVTRConfig,
    LVTRUnet,
)
from advancedliteratemachinery_tpu.models.trcg import TRCG, TRCGConfig
from advancedliteratemachinery_tpu.models.vit import ViTConfig
from advancedliteratemachinery_tpu.parallel.mesh import create_mesh

LVTR_TINY = LVTRConfig(base_ch=8, ch_mults=(1, 2), charset_size=20,
                       text_embed_dim=8, max_text_len=8, timesteps=10,
                       sample_steps=4)


def _lvtr_manifest(tmp_path):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(2):
        names = {}
        for key, ch in (("image", 3), ("removal", 3), ("render", 3),
                        ("line_mask", 1), ("word_mask", 1)):
            name = f"{key}{i}.png"
            arr = rng.integers(0, 255, (16, 32, 3), np.uint8) if ch == 3 \
                else rng.integers(0, 2, (16, 32), np.uint8) * 255
            Image.fromarray(arr).save(tmp_path / name)
            names[key] = name
        rows.append({**names, "text": "hi"})
    p = tmp_path / "train.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    return str(p)


class TestFitLvtr:
    def test_batches_and_fit(self, tmp_path):
        ds = B.LVTRManifestDataset(_lvtr_manifest(tmp_path))
        it = B.lvtr_batches(ds, batch_size=2, image_hw=(16, 32),
                            charset="hi", max_text_len=8)
        b = next(it)
        assert b["x0"].shape == (2, 16, 32, 3)
        assert 0.0 <= b["x0"].min() and b["x0"].max() <= 1.0
        assert set(np.unique(b["line_poly_mask"])) <= {0.0, 1.0}
        assert b["text_ids"][0, 0] > 0               # 'h' encoded

        model = LVTRUnet(LVTR_TINY, policy=FP32_POLICY)
        recognizer = ExCTC(width=4, policy=FP32_POLICY)
        conds = {k: jnp.asarray(b[k]) for k in
                 ("images_style", "images_removal", "images_render",
                  "line_poly_mask", "word_poly_mask", "text_ids")}
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(b["x0"]),
                            jnp.zeros((2,)), conds)["params"]
        rec_params = recognizer.init(jax.random.PRNGKey(1),
                                     jnp.asarray(b["x0"]))["params"]
        loss_fn, tx = lvtr_recipe(model, recognizer, rec_params, LVTR_TINY)
        res = fit(loss_fn, tx, params, it,
                  FitConfig(total_steps=2, log_interval=1),
                  mesh=create_mesh(data=1, devices=jax.devices()[:1]),
                  log_fn=lambda m: None)
        assert res.steps_run == 2
        assert np.isfinite(res.last_metrics["loss"])


import pytest


@pytest.mark.slow
class TestLvtrOverfit:
    def test_overfits_denoising_psnr(self, tmp_path):
        """Task-metric overfit proof (VERDICT r4 item 4): the diffusion
        train path (manifest → lvtr_batches → lvtr_recipe w/ frozen
        ExCTC → fit) must learn to denoise ITS OWN images: at a fixed
        mid-schedule timestep, x̂0 reconstructed from the predicted eps
        (DDPM.pred_x0, the reference's q-posterior mean input) reaches
        PSNR ≥ 20 dB vs the clean target and improves ≥ 5 dB over the
        untrained net."""
        import jax.numpy as jnp

        from advancedliteratemachinery_tpu.models.lvtr import DDPM

        ds = B.LVTRManifestDataset(_lvtr_manifest(tmp_path))
        it = B.lvtr_batches(ds, batch_size=2, image_hw=(16, 32),
                            charset="hi", max_text_len=8)
        b = next(it)
        model = LVTRUnet(LVTR_TINY, policy=FP32_POLICY)
        recognizer = ExCTC(width=4, policy=FP32_POLICY)
        cond_keys = ("images_style", "images_removal", "images_render",
                     "line_poly_mask", "word_poly_mask", "text_ids")
        conds = {k: jnp.asarray(b[k]) for k in cond_keys}
        x0 = jnp.asarray(b["x0"])
        import optax

        params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((2,)),
                            conds)["params"]
        rec_params = recognizer.init(jax.random.PRNGKey(1), x0)["params"]
        # recipe loss; its production optimizer warms up over far more
        # steps than this proof's budget — flat LR instead
        loss_fn, _ = lvtr_recipe(model, recognizer, rec_params, LVTR_TINY)
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-3))

        ddpm = DDPM(LVTR_TINY)
        t = jnp.full((2,), 3, jnp.int32)          # mid-schedule (of 10)
        noise = jax.random.normal(jax.random.PRNGKey(5), x0.shape)
        x_t = ddpm.q_sample(x0, t, noise)

        def psnr(p):
            eps = model.apply({"params": p}, x_t, t, conds)
            x0_hat = np.clip(np.asarray(ddpm.pred_x0(x_t, t, eps)), 0, 1)
            mse = float(np.mean((x0_hat - np.asarray(x0)) ** 2))
            return float(10 * np.log10(1.0 / max(mse, 1e-12)))

        before = psnr(params)
        best = {"psnr": -1e9}

        def eval_fn(state):
            val = psnr(state.params)
            best["psnr"] = max(best["psnr"], val)
            return {"psnr": val}

        fit(loss_fn, tx, params, it,
            FitConfig(total_steps=1000, log_interval=200, val_interval=50),
            mesh=create_mesh(data=1, devices=jax.devices()[:1]),
            eval_fn=eval_fn, log_fn=lambda m: None)
        assert best["psnr"] >= 20.0 and best["psnr"] >= before + 5.0, \
            f"denoising never learned: before {before:.1f} dB, best {best}"


@pytest.mark.slow
class TestTrcgOverfit:
    def test_overfits_next_token_accuracy(self, tmp_path):
        """Task-metric overfit proof (VERDICT r4 item 4): LoRA-only
        finetuning (base frozen — the optimizer is the freeze, reference
        scripts/finetune_flash_attn.sh) reaches 100% teacher-forced
        next-token accuracy on its own 2-sequence corpus — the token
        objective llava's trainer optimizes (llava/train/train.py)."""
        import jax.numpy as jnp

        ds = B.TRCGManifestDataset(_trcg_manifest(tmp_path))
        it = B.trcg_batches(ds, batch_size=2, image_hw=(16, 16), max_len=8)
        b = next(it)
        model = TRCG(TRCG_TINY, policy=FP32_POLICY)
        images = jnp.asarray(b["images"])
        ids = jnp.asarray(b["input_ids"])
        params = model.init(jax.random.PRNGKey(0), images, ids)["params"]
        n_img = 4
        loss_fn, tx = trcg_recipe(model, n_img)

        fwd = jax.jit(lambda p: model.apply({"params": p}, images, ids,
                                            deterministic=True))
        # real (non-pad) next-token positions: rows are [1,5,7,9,2,0,0,0]
        tgt = np.asarray(b["input_ids"])[:, 1:]
        live = tgt > 0
        best = {"acc": 0.0}

        def eval_fn(state):
            logits = np.asarray(fwd(state.params))[:, n_img:-1]
            acc = float((logits.argmax(-1) == tgt)[live].mean())
            best["acc"] = max(best["acc"], acc)
            return {"next_token_acc": acc}

        fit(loss_fn, tx, params, it,
            FitConfig(total_steps=400, log_interval=100, val_interval=25),
            mesh=create_mesh(data=1, devices=jax.devices()[:1]),
            eval_fn=eval_fn, log_fn=lambda m: None)
        assert best["acc"] == 1.0, \
            f"LoRA finetune never fit its own 2 sequences ({best})"


TRCG_TINY = TRCGConfig(
    vocab_size=50, hidden_size=32, num_layers=1, heads=2, lora_rank=2,
    vision=ViTConfig(img_size=(16, 16), patch_size=8, embed_dim=32,
                     depth=1, num_heads=2, apply_final_norm=True))


def _trcg_manifest(tmp_path):
    rows = []
    for i in range(2):
        name = f"scene{i}.png"
        Image.new("RGB", (20, 20), "gray").save(tmp_path / name)
        rows.append({"image": name, "input_ids": [1, 5, 7, 9, 2]})
    p = tmp_path / "train.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    return str(p)


class TestFitTrcg:
    def test_lora_finetune_freezes_base(self, tmp_path):
        ds = B.TRCGManifestDataset(_trcg_manifest(tmp_path))
        it = B.trcg_batches(ds, batch_size=2, image_hw=(16, 16), max_len=8)
        b = next(it)
        assert b["images"].shape == (2, 16, 16, 3)
        assert b["input_ids"][0, 0] == 1

        model = TRCG(TRCG_TINY, policy=FP32_POLICY)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.asarray(b["images"]),
                            jnp.asarray(b["input_ids"]))["params"]
        base_q = np.asarray(
            params["layer_0"]["q_proj"]["base"]["kernel"]).copy()
        lora_a = np.asarray(params["layer_0"]["q_proj"]["lora_A"]).copy()
        n_img = 4                                    # (16/8)^2 patches
        loss_fn, tx = trcg_recipe(model, n_img)
        res = fit(loss_fn, tx, params, it,
                  FitConfig(total_steps=2, log_interval=1),
                  mesh=create_mesh(data=1, devices=jax.devices()[:1]),
                  log_fn=lambda m: None)
        assert res.steps_run == 2
        assert np.isfinite(res.last_metrics["loss"])
        p2 = res.state.params["layer_0"]["q_proj"]
        # base frozen; adapters moved (the optimizer IS the freezing
        # mechanism, scripts/finetune_flash_attn.sh LoRA semantics)
        np.testing.assert_array_equal(np.asarray(p2["base"]["kernel"]),
                                      base_q)
        assert not np.allclose(np.asarray(p2["lora_A"]), lora_a)
