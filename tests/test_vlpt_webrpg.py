import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.models.vlpt import VLPT, VLPTConfig, vlpt_losses
from advancedliteratemachinery_tpu.models.webrpg import (
    ElementVAE,
    WebRPGConfig,
    WebRPGModel,
    vae_loss,
    webrpg_losses,
)

TINY_VLPT = VLPTConfig(embed_dim=32, vocab_size=200, max_text_len=16,
                       image_size=64, image_depth=1, text_depth=1,
                       co_depth=1, heads=2, fpn_dim=8, resnet_base=4,
                       resnet_blocks=(1, 1, 1, 1), false_text_length=8)


def _vlpt_batch(B=2, T=16):
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 200, (B, T))
    labels = np.full((B, T), -100)
    labels[:, 3] = ids[:, 3]  # one masked position
    ids_mlm = ids.copy()
    ids_mlm[:, 3] = 1  # [MASK]
    return {
        "image": jnp.asarray(rng.standard_normal((B, 64, 64, 3)), jnp.float32),
        "text_ids": jnp.asarray(ids, jnp.int32),
        "text_ids_mlm": jnp.asarray(ids_mlm, jnp.int32),
        "text_labels_mlm": jnp.asarray(labels, jnp.int32),
        "text_masks": jnp.ones((B, T), jnp.int32),
    }


class TestVLPT:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = VLPT(TINY_VLPT, policy=FP32_POLICY)
        batch = _vlpt_batch()
        vars_ = model.init(jax.random.PRNGKey(0), batch)
        return model, vars_, batch

    def test_outputs(self, model_and_vars):
        model, vars_, batch = model_and_vars
        out, _ = model.apply(vars_, batch, mutable=["batch_stats"])
        B, T = batch["text_ids"].shape
        assert out["mlm_logits"].shape == (B, T, 200)
        assert out["image_feats"].shape == (B, 32)
        assert out["wip_logits"].shape == (B, T, 8)
        # features are unit-norm
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out["image_feats"]), axis=-1), 1.0, atol=1e-4)

    def test_losses_and_grad(self, model_and_vars):
        model, vars_, batch = model_and_vars

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, **{k: v for k, v in vars_.items() if k != "params"}},
                batch, mutable=["batch_stats"])
            return vlpt_losses(out, batch)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(vars_["params"])
        assert np.isfinite(float(loss))
        gn = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
        assert float(gn) > 0

    def test_wip_excludes_specials_and_masked(self, model_and_vars):
        model, vars_, batch = model_and_vars
        out, _ = model.apply(vars_, batch, mutable=["batch_stats"])
        valid = np.asarray(out["wip_valid"])
        assert not valid[:, 0].any()      # CLS excluded
        assert not valid[:, 3].any()      # MLM-masked position excluded


TINY_WEB = WebRPGConfig(param_vocab=32, parameters_len=6, latent_dim=8,
                        vae_hidden=(8, 16), embed_dim=16, enc_layers=1,
                        dec_layers=1, heads=2, global_text_dim=8,
                        element_text_dim=8, xpath_dim=8, chrlen_vocab=64)


def _web_batch(B=2, N=5):
    rng = np.random.default_rng(0)
    return {
        "param_ids": jnp.asarray(rng.integers(0, 32, (B, N, 6)), jnp.int32),
        "global_text": jnp.asarray(rng.standard_normal((B, 1, 8)), jnp.float32),
        "element_text": jnp.asarray(rng.standard_normal((B, N, 8)), jnp.float32),
        "chrlen": jnp.asarray(rng.integers(0, 64, (B, N)), jnp.int32),
        "xpath": jnp.asarray(rng.standard_normal((B, N, 8)), jnp.float32),
        "element_mask": jnp.ones((B, N), jnp.int32),
    }


class TestWebRPG:
    def test_vae_roundtrip_shapes(self):
        vae = ElementVAE(TINY_WEB, policy=FP32_POLICY)
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 32, (4, 6)))
        vars_ = vae.init(jax.random.PRNGKey(0), ids, jax.random.PRNGKey(1))
        recon, mu, logvar, z = vae.apply(vars_, ids, jax.random.PRNGKey(2))
        assert recon.shape == (4, 6, 32)
        assert mu.shape == (4, 8) and z.shape == (4, 8)

    def test_vae_loss(self):
        logits = jnp.zeros((2, 6, 32)).at[:, :, 5].set(10.0)
        ids = jnp.full((2, 6), 5, jnp.int32)
        out = vae_loss(logits, ids, jnp.zeros((2, 8)), jnp.zeros((2, 8)), 0.001)
        assert float(out["recon"]) < 0.01
        assert float(out["kld"]) == pytest.approx(0.0, abs=1e-6)

    def test_model_and_losses(self):
        model = WebRPGModel(TINY_WEB, policy=FP32_POLICY)
        batch = _web_batch()
        vars_ = model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
        out = model.apply(vars_, batch, jax.random.PRNGKey(2))
        assert out["pred_latents"].shape == (2, 5, 8)
        losses = webrpg_losses(out, batch, TINY_WEB)
        assert np.isfinite(float(losses["loss"]))

    def test_render_params(self):
        model = WebRPGModel(TINY_WEB, policy=FP32_POLICY)
        batch = _web_batch()
        vars_ = model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
        out = model.apply(vars_, batch, jax.random.PRNGKey(2))
        logits = model.apply(vars_, out["pred_latents"],
                             method=model.render_params)
        assert logits.shape == (2, 5, 6, 32)
