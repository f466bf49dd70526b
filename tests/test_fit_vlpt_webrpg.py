"""VLPT-STD and WebRPG training paths through fit(): pyarrow shards →
MLM batches (reference main.py:95 loop) and cached-embedding records →
AR batches (trainer_ar.py), with the frozen-VAE optimizer verified."""

import io

import jax
import numpy as np
import pytest
from PIL import Image

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.data.arrow_dataset import (
    MLMSpec,
    SynthTextArrowDataset,
    write_synthtext_arrow,
)
from advancedliteratemachinery_tpu.engine import batches as B
from advancedliteratemachinery_tpu.engine.fit import FitConfig, fit
from advancedliteratemachinery_tpu.engine.recipes import (
    vlpt_recipe,
    webrpg_recipe,
)
from advancedliteratemachinery_tpu.models.vlpt import VLPT, VLPTConfig
from advancedliteratemachinery_tpu.models.webrpg import (
    WebRPGConfig,
    WebRPGModel,
)
from advancedliteratemachinery_tpu.parallel.mesh import create_mesh

TINY_VLPT = VLPTConfig(embed_dim=32, vocab_size=200, max_text_len=16,
                       image_size=64, image_depth=1, text_depth=1,
                       co_depth=1, heads=2, fpn_dim=8, resnet_base=4,
                       resnet_blocks=(1, 1, 1, 1), false_text_length=8)

TINY_WEB = WebRPGConfig(param_vocab=32, parameters_len=6, latent_dim=8,
                        vae_hidden=(8, 16), embed_dim=16, enc_layers=1,
                        dec_layers=1, heads=2, global_text_dim=8,
                        element_text_dim=8, xpath_dim=8, chrlen_vocab=64)


def _arrow_file(tmp_path):
    rows = []
    for i, text in enumerate(["hello world", "jax on tpu", "du guang"]):
        img = Image.fromarray(np.random.default_rng(i).integers(
            0, 255, (32, 48, 3), np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        rows.append((buf.getvalue(), text, f"img{i}"))
    p = str(tmp_path / "synthtext.arrow")
    write_synthtext_arrow(rows, p)
    return p


class TestFitVlpt:
    def test_mlm_batches_and_fit(self, tmp_path):
        spec = MLMSpec(encode=lambda t: [10 + (ord(c) % 150)
                                         for c in t][:14],
                       vocab_size=200)
        ds = SynthTextArrowDataset(_arrow_file(tmp_path), spec,
                                   image_size=TINY_VLPT.image_size,
                                   max_text_len=TINY_VLPT.max_text_len)
        it = B.vlpt_batches(ds, batch_size=2)
        b = next(it)
        assert b["image"].shape == (2, 64, 64, 3)
        assert b["text_ids"].shape == (2, 16)
        model = VLPT(TINY_VLPT, policy=FP32_POLICY)
        variables = model.init(jax.random.PRNGKey(0),
                               jax.tree.map(lambda a: a, b), train=True)
        loss_fn, tx = vlpt_recipe(model)
        res = fit(loss_fn, tx, variables["params"], it,
                  FitConfig(total_steps=2, log_interval=1),
                  mesh=create_mesh(data=1, devices=jax.devices()[:1]),
                  batch_stats=variables["batch_stats"],
                  log_fn=lambda m: None)
        assert res.steps_run == 2
        assert np.isfinite(res.last_metrics["loss"])


class TestFitWebRPG:
    def _records(self, tmp_path, n=3):
        rng = np.random.default_rng(0)
        for i in range(n):
            E = 5
            np.savez(tmp_path / f"page{i}.npz",
                     param_ids=rng.integers(
                         0, TINY_WEB.param_vocab,
                         (E, TINY_WEB.parameters_len)).astype(np.int32),
                     global_text=rng.standard_normal(
                         (1, TINY_WEB.global_text_dim)).astype(np.float32),
                     element_text=rng.standard_normal(
                         (E, TINY_WEB.element_text_dim)).astype(np.float32),
                     chrlen=rng.integers(0, 64, E).astype(np.int32),
                     xpath=rng.standard_normal(
                         (E, TINY_WEB.xpath_dim)).astype(np.float32),
                     element_mask=np.ones(E, np.float32))
        return str(tmp_path)

    def test_batches_and_frozen_vae_fit(self, tmp_path):
        ds = B.WebRPGCacheDataset(self._records(tmp_path))
        it = B.webrpg_batches(ds, batch_size=2, max_elements=8)
        b = next(it)
        assert b["param_ids"].shape == (2, 8, TINY_WEB.parameters_len)
        assert b["element_mask"][0].sum() == 5
        model = WebRPGModel(TINY_WEB, policy=FP32_POLICY)
        params = model.init(jax.random.PRNGKey(0),
                            jax.tree.map(lambda a: a, b),
                            jax.random.PRNGKey(1))["params"]
        vae_before = jax.tree.map(np.asarray, params["vae"])
        loss_fn, tx = webrpg_recipe(model, TINY_WEB)
        res = fit(loss_fn, tx, params, it,
                  FitConfig(total_steps=2, log_interval=1),
                  mesh=create_mesh(data=1, devices=jax.devices()[:1]),
                  log_fn=lambda m: None)
        assert res.steps_run == 2
        assert np.isfinite(res.last_metrics["loss"])
        # the VAE stays FROZEN during AR training (trainer_ar.py loads a
        # pretrained VAE; recipe zeroes its grads)
        vae_after = jax.tree.map(np.asarray, res.state.params["vae"])
        jax.tree.map(np.testing.assert_array_equal, vae_before, vae_after)
