import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.models.lvtr import (
    DDPM,
    ExCTC,
    LVTRConfig,
    LVTRUnet,
    cosine_betas,
    timestep_embedding,
)

TINY = LVTRConfig(base_ch=16, ch_mults=(1, 2), charset_size=40,
                  text_embed_dim=32, max_text_len=8, timesteps=100,
                  sample_steps=4)


def _conditions(B=1, H=32, W=64):
    rng = np.random.default_rng(0)
    return {
        "images_style": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32),
        "images_removal": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32),
        "images_render": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32),
        "line_poly_mask": jnp.ones((B, H, W, 1), jnp.float32),
        "word_poly_mask": jnp.ones((B, H, W, 1), jnp.float32),
        "text_ids": jnp.asarray(rng.integers(0, 40, (B, 8)), jnp.int32),
    }


class TestSchedule:
    def test_cosine_betas(self):
        b = cosine_betas(100)
        assert b.shape == (100,)
        assert (b > 0).all() and (b <= 0.999).all()
        assert b[-1] > b[0]  # increasing noise

    def test_timestep_embedding(self):
        e = timestep_embedding(jnp.asarray([0, 50]), 16)
        assert e.shape == (2, 16)
        assert not np.allclose(np.asarray(e[0]), np.asarray(e[1]))

    def test_q_sample_endpoints(self):
        ddpm = DDPM(TINY)
        x0 = jnp.ones((1, 4, 4, 3))
        noise = jnp.zeros_like(x0)
        early = ddpm.q_sample(x0, jnp.asarray([0]), noise)
        late = ddpm.q_sample(x0, jnp.asarray([99]), noise)
        assert float(early.mean()) > float(late.mean())  # signal decays


class TestLVTR:
    @pytest.fixture(scope="class")
    def setup(self):
        unet = LVTRUnet(TINY, policy=FP32_POLICY)
        cond = _conditions()
        x = jnp.zeros((1, 32, 64, 3))
        t = jnp.zeros((1,), jnp.int32)
        params = unet.init(jax.random.PRNGKey(0), x, t, cond)["params"]
        rec = ExCTC(width=8, policy=FP32_POLICY)
        rec_vars = rec.init(jax.random.PRNGKey(1), x)
        return unet, params, rec, rec_vars, cond

    def test_unet_output(self, setup):
        unet, params, rec, rec_vars, cond = setup
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 64, 3))
        eps = unet.apply({"params": params}, x, jnp.asarray([10]), cond)
        assert eps.shape == (1, 32, 64, 3)

    def test_text_condition_used(self, setup):
        unet, params, rec, rec_vars, cond = setup
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 64, 3))
        t = jnp.asarray([10])
        e1 = unet.apply({"params": params}, x, t, cond)
        cond2 = dict(cond)
        cond2["text_ids"] = (cond["text_ids"] + 7) % 40
        e2 = unet.apply({"params": params}, x, t, cond2)
        assert not np.allclose(np.asarray(e1), np.asarray(e2))

    def test_training_losses(self, setup):
        unet, params, rec, rec_vars, cond = setup
        ddpm = DDPM(TINY)
        x0 = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 32, 64, 3)),
                         jnp.float32)

        def unet_apply(p, x, t, c):
            return unet.apply({"params": p}, x, t, c)

        def rec_apply(v, x):
            return rec.apply(v, x, method=rec.get_image_features)

        losses = ddpm.training_losses(unet_apply, rec_apply, params, rec_vars,
                                      x0, cond, jax.random.PRNGKey(3))
        for k in ("loss", "loss_dm", "loss_background", "loss_foreground"):
            assert np.isfinite(float(losses[k])), k

    def test_sampler_runs(self, setup):
        unet, params, rec, rec_vars, cond = setup
        ddpm = DDPM(TINY)

        def unet_apply(p, x, t, c):
            return unet.apply({"params": p}, x, t, c)

        out = jax.jit(lambda p, c, r: ddpm.sample(unet_apply, p, c,
                                                  (1, 32, 64, 3), r))(
            params, cond, jax.random.PRNGKey(4))
        assert out.shape == (1, 32, 64, 3)
        assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


class TestExCTC:
    def test_logits_and_features(self):
        rec = ExCTC(num_classes=40, width=8, policy=FP32_POLICY)
        x = jnp.zeros((2, 32, 64, 3))
        vars_ = rec.init(jax.random.PRNGKey(0), x)
        logits = rec.apply(vars_, x)
        feats = rec.apply(vars_, x, method=rec.get_image_features)
        assert logits.shape[0] == 2 and logits.shape[-1] == 40
        assert feats.shape[0] == 2
