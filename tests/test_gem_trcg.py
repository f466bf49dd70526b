import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.models.gem import (
    GEMConfig,
    GEMForSWDE,
    GEMForWebSRC,
)
from advancedliteratemachinery_tpu.models.trcg import (
    TRCG,
    TRCGConfig,
    lora_param_filter,
    trcg_loss,
)
from advancedliteratemachinery_tpu.models.vit import ViTConfig

TINY_GEM = GEMConfig(vocab_size=100, hidden_size=32, num_layers=1, heads=2,
                     max_xpath_depth=4, xpath_tag_vocab=20, xpath_subs_vocab=16,
                     xpath_unit_hidden=8, num_labels=5)


def _gem_batch(B=2, S=12, depth=4):
    rng = np.random.default_rng(0)
    return {
        "input_ids": jnp.asarray(rng.integers(0, 100, (B, S)), jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "xpath_tags_seq": jnp.asarray(rng.integers(0, 20, (B, S, depth)), jnp.int32),
        "xpath_subs_seq": jnp.asarray(rng.integers(0, 16, (B, S, depth)), jnp.int32),
        "render_bbox": jnp.asarray(rng.uniform(0, 1, (B, S, 4)), jnp.float32),
    }


class TestGEM:
    def test_swde_head(self):
        m = GEMForSWDE(TINY_GEM, policy=FP32_POLICY)
        b = _gem_batch()
        params = m.init(jax.random.PRNGKey(0), b)["params"]
        out = m.apply({"params": params}, b)
        assert out.shape == (2, 12, 5)

    def test_websrc_head(self):
        m = GEMForWebSRC(TINY_GEM, policy=FP32_POLICY)
        b = _gem_batch()
        params = m.init(jax.random.PRNGKey(0), b)["params"]
        out = m.apply({"params": params}, b)
        assert out["start_logits"].shape == (2, 12)

    def test_xpath_contributes(self):
        m = GEMForSWDE(TINY_GEM, policy=FP32_POLICY)
        b = _gem_batch()
        params = m.init(jax.random.PRNGKey(0), b)["params"]
        o1 = m.apply({"params": params}, b)
        b2 = dict(b)
        b2["xpath_tags_seq"] = (b["xpath_tags_seq"] + 3) % 20
        o2 = m.apply({"params": params}, b2)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))


TINY_TRCG = TRCGConfig(
    vocab_size=120, hidden_size=32, num_layers=1, heads=2, lora_rank=4,
    vision=ViTConfig(img_size=(32, 32), patch_size=16, embed_dim=32, depth=1,
                     num_heads=2, apply_final_norm=True))


class TestTRCG:
    @pytest.fixture(scope="class")
    def setup(self):
        m = TRCG(TINY_TRCG, policy=FP32_POLICY)
        imgs = jnp.zeros((2, 32, 32, 3))
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 120, (2, 10)))
        params = m.init(jax.random.PRNGKey(0), imgs, ids)["params"]
        return m, params, imgs, ids

    def test_logits_shape(self, setup):
        m, params, imgs, ids = setup
        out = m.apply({"params": params}, imgs, ids)
        n_img = (32 // 16) ** 2
        assert out.shape == (2, n_img + 10, 120)

    def test_causality(self, setup):
        m, params, imgs, ids = setup
        n_img = 4
        o1 = m.apply({"params": params}, imgs, ids)
        ids2 = ids.at[:, 7].set((ids[:, 7] + 1) % 120)
        o2 = m.apply({"params": params}, imgs, ids2)
        np.testing.assert_allclose(np.asarray(o1[:, : n_img + 7]),
                                   np.asarray(o2[:, : n_img + 7]), atol=1e-5)

    def test_loss(self, setup):
        m, params, imgs, ids = setup
        out = m.apply({"params": params}, imgs, ids)
        loss = trcg_loss(out, ids, n_image_tokens=4, ignore_prefix=2)
        assert np.isfinite(float(loss)) and float(loss) > 0

    def test_lora_zero_init_is_identity_and_trainable_subset(self, setup):
        m, params, imgs, ids = setup
        # LoRA B is zero-init → removing the adapters must not change output
        import copy

        out1 = m.apply({"params": params}, imgs, ids)
        zeroed = jax.tree_util.tree_map_with_path(
            lambda path, x: jnp.zeros_like(x)
            if lora_param_filter(path) else x, params)
        out2 = m.apply({"params": zeroed}, imgs, ids)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
        n_lora = sum(1 for p, _ in
                     jax.tree_util.tree_flatten_with_path(params)[0]
                     if lora_param_filter(p))
        assert n_lora == 6  # q/k/v × (A+B) × layers(1)

    def test_lora_optimizer_freezes_base(self, setup):
        import optax

        from advancedliteratemachinery_tpu.models.trcg import lora_optimizer

        m, params, imgs, ids = setup
        tx = lora_optimizer(1e-2)
        opt = tx.init(params)
        g = jax.grad(lambda p: trcg_loss(m.apply({"params": p}, imgs, ids),
                                         ids, 4))(params)
        u, _ = tx.update(g, opt, params)
        p2 = optax.apply_updates(params, u)
        base = params["layer_0"]["q_proj"]["base"]["kernel"]
        base2 = p2["layer_0"]["q_proj"]["base"]["kernel"]
        np.testing.assert_array_equal(np.asarray(base), np.asarray(base2))
        assert not np.allclose(np.asarray(params["layer_0"]["q_proj"]["lora_B"]),
                               np.asarray(p2["layer_0"]["q_proj"]["lora_B"]))


class TestTRCGGenerate:
    """KV-cached scan generation == naive full-forward greedy rollout
    (reference inference.py:169 model.generate(use_cache=True))."""

    def test_cached_equals_naive_greedy(self):
        from advancedliteratemachinery_tpu.models.trcg import trcg_generate

        m = TRCG(TINY_TRCG, policy=FP32_POLICY)
        rng = np.random.default_rng(3)
        imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        ids = jnp.asarray(rng.integers(3, 120, (2, 6)))
        params = m.init(jax.random.PRNGKey(0), imgs, ids)["params"]

        max_new = 5
        got = trcg_generate(m, {"params": params}, imgs, ids,
                            max_new_tokens=max_new, eos_id=2)

        # naive rollout: re-run the full forward each step
        cur = ids
        naive = []
        for _ in range(max_new):
            logits = m.apply({"params": params}, imgs, cur)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            naive.append(nxt)
            cur = jnp.concatenate([cur, nxt[:, None]], axis=1)
        naive = jnp.stack(naive, axis=1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(naive))

    def test_eos_padding(self):
        from advancedliteratemachinery_tpu.models.trcg import trcg_generate

        m = TRCG(TINY_TRCG, policy=FP32_POLICY)
        imgs = jnp.zeros((1, 32, 32, 3))
        ids = jnp.asarray([[5, 6]])
        params = m.init(jax.random.PRNGKey(0), imgs, ids)["params"]
        out = np.asarray(trcg_generate(m, {"params": params}, imgs, ids,
                                       max_new_tokens=8, eos_id=2))
        # once EOS appears every later position must be EOS
        for row in out:
            hit = np.where(row == 2)[0]
            if hit.size:
                assert (row[hit[0]:] == 2).all()
