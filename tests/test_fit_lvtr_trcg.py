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
