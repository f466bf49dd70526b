import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.models.dla import (
    DLA,
    DLAConfig,
    DLASeg,
    DLASegConfig,
)
from advancedliteratemachinery_tpu.models.lore import (
    LORE,
    LoreConfig,
    LoreProcessor,
    axis_loss,
    focal_loss,
    reg_l1_loss,
)

# tiny configs for CI speed
TINY_DLA = DLAConfig(levels=(1, 1, 1, 1, 1, 1), channels=(4, 8, 8, 16, 16, 32))
TINY_SEG = DLASegConfig(
    dla=TINY_DLA, head_conv=16,
    heads=(("hm", 2), ("st", 8), ("wh", 8), ("ax", 16), ("cr", 16), ("reg", 2)),
)
TINY_LORE = LoreConfig(backbone=TINY_SEG, input_size=16, hidden_size=16,
                       tsfm_layers=1, stacking_layers=1, num_heads=2,
                       max_fmp_size=64, top_k=8, corner_k=8)


class TestDLA:
    def test_pyramid_shapes(self):
        model = DLA(TINY_DLA, policy=FP32_POLICY)
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(vars_, x)
        assert len(y) == 6
        assert y[0].shape == (1, 64, 64, 4)
        assert y[5].shape == (1, 2, 2, 32)

    def test_dlaseg_heads(self):
        model = DLASeg(TINY_SEG, policy=FP32_POLICY)
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(vars_, x)
        assert out["hm"].shape == (1, 16, 16, 2)
        assert out["wh"].shape == (1, 16, 16, 8)
        assert out["ax"].shape == (1, 16, 16, 16)
        # hm bias init → sigmoid ≈ 0.1 (focal-loss warm start, -2.19)
        assert float(jax.nn.sigmoid(out["hm"]).mean()) == pytest.approx(0.1, abs=0.05)

    def test_batchnorm_updates_stats(self):
        model = DLASeg(TINY_SEG, policy=FP32_POLICY)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
        vars_ = model.init(jax.random.PRNGKey(1), x)
        _, new_state = model.apply(vars_, x, train=True, mutable=["batch_stats"])
        before = jax.tree.leaves(vars_["batch_stats"])
        after = jax.tree.leaves(new_state["batch_stats"])
        changed = any(not np.allclose(np.asarray(b), np.asarray(a))
                      for b, a in zip(before, after))
        assert changed


class TestLoreProcessor:
    def test_logic_output(self):
        proc = LoreProcessor(TINY_LORE, policy=FP32_POLICY)
        feat = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
        boxes = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8))) * 10
        params = proc.init(jax.random.PRNGKey(2), feat, boxes)["params"]
        out = proc.apply({"params": params}, feat, boxes)
        assert out["logic"].shape == (2, 8, 4)
        assert out["stacked_logic"].shape == (2, 8, 4)
        # ReLU'd outputs are non-negative (logical coords)
        assert float(out["logic"].min()) >= 0.0

    def test_mask_blocks_attention(self):
        proc = LoreProcessor(TINY_LORE.replace(wiz_stacking=False, wiz_2dpe=False),
                             policy=FP32_POLICY)
        feat = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 16))
        params = proc.init(jax.random.PRNGKey(2), feat, None)["params"]
        mask = jnp.ones((1, 8)).at[0, 4:].set(0.0)
        out1 = proc.apply({"params": params}, feat, None, mask)["logic"]
        feat2 = feat.at[:, 4:].set(99.0)  # change masked-out cells
        out2 = proc.apply({"params": params}, feat2, None, mask)["logic"]
        np.testing.assert_allclose(np.asarray(out1[:, :4]), np.asarray(out2[:, :4]),
                                   atol=1e-5)


class TestLOREInference:
    def test_infer_end_to_end(self):
        model = LORE(TINY_LORE, policy=FP32_POLICY)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
        vars_ = model.init(jax.random.PRNGKey(1), x, method=model.infer)
        out = jax.jit(lambda v, x: model.apply(v, x, method=model.infer))(vars_, x)
        assert out["detections"].shape == (1, 8, 10)
        assert out["logic"].shape == (1, 8, 4)
        assert out["corners"].shape == (1, 8, 8)
        assert np.isfinite(np.asarray(out["logic"])).all()

    def test_train_logic_path(self):
        model = LORE(TINY_LORE, policy=FP32_POLICY)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
        ct_inds = jnp.asarray([[0, 5, 17, 3, 0, 0, 0, 0]], jnp.int32)
        ct_mask = jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0]], jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(1), x, ct_inds, ct_mask,
                           method=model.train_logic)
        (heads, logic), _ = model.apply(
            vars_, x, ct_inds, ct_mask, method=model.train_logic,
            mutable=["batch_stats"])
        assert logic["logic"].shape == (1, 8, 4)
        assert heads["hm"].shape == (1, 16, 16, 2)


class TestLoreLosses:
    def test_focal_loss_perfect_pred(self):
        gt = jnp.zeros((1, 4, 4, 1)).at[0, 2, 2, 0].set(1.0)
        pred = jnp.where(gt == 1, 0.999, 0.001)
        assert float(focal_loss(pred, gt)) < 0.01

    def test_focal_loss_penalizes_miss(self):
        gt = jnp.zeros((1, 4, 4, 1)).at[0, 2, 2, 0].set(1.0)
        good = jnp.where(gt == 1, 0.99, 0.01)
        bad = jnp.where(gt == 1, 0.01, 0.01)
        assert float(focal_loss(bad, gt)) > float(focal_loss(good, gt))

    def test_reg_l1(self):
        pred = jnp.ones((1, 3, 2))
        target = jnp.zeros((1, 3, 2))
        mask = jnp.asarray([[1.0, 1.0, 0.0]])
        # |1-0| over 4 valid elems / 4 = 1.0
        assert float(reg_l1_loss(pred, mask, target)) == pytest.approx(1.0, rel=1e-3)

    def test_axis_loss(self):
        pred = jnp.full((1, 2, 4), 2.0)
        target = jnp.zeros((1, 2, 4))
        mask = jnp.ones((1, 2))
        # sum |2| * 8 / (4 * 2) = 2.0
        assert float(axis_loss(pred, mask, target)) == pytest.approx(2.0, rel=1e-3)


class TestInitFull:
    def test_init_full_covers_processor(self):
        model = LORE(TINY_LORE, policy=FP32_POLICY)
        vars_ = model.init_full(jax.random.PRNGKey(0), image_shape=(64, 64))
        assert "processor" in vars_["params"]
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3))
        out = model.apply(vars_, x, method=model.infer)
        assert np.isfinite(np.asarray(out["logic"])).all()
