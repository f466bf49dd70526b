import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.models.bros import (
    BrosConfig,
    BrosTextEncoder,
    sinusoid_1d,
    sinusoid_2d,
)
from advancedliteratemachinery_tpu.models.convnext import ConvNeXt, ConvNeXtConfig
from advancedliteratemachinery_tpu.models.geolayoutlm import (
    GeoLayoutLM,
    GeoLayoutLMConfig,
    geolayoutlm_losses,
    roi_block_feature,
)

TINY_BROS = BrosConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=64,
                       max_position_embeddings=32,
                       coordinate_size=6, shape_size=4)  # 4*6+2*4 == 32
TINY_CONVNEXT = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64))
TINY = GeoLayoutLMConfig(bros=TINY_BROS, convnext=TINY_CONVNEXT, n_classes=7,
                         vis_channels=16, max_rel_enc=8)


def _batch(B=2, S=16, N=4, H=64):
    rng = np.random.default_rng(0)
    boxes = np.sort(rng.integers(0, 1000, (B, S, 2, 2)), axis=2)
    bbox = np.concatenate([boxes[:, :, 0], boxes[:, :, 1]], -1)  # x1,y1,x2,y2
    quad = np.zeros((B, S, 8), np.float32)
    quad[..., 0:2] = bbox[..., 0:2] / 1000
    quad[..., 2:4] = np.stack([bbox[..., 2], bbox[..., 1]], -1) / 1000
    quad[..., 4:6] = bbox[..., 2:4] / 1000
    quad[..., 6:8] = np.stack([bbox[..., 0], bbox[..., 3]], -1) / 1000
    return {
        "image": jnp.asarray(rng.integers(0, 255, (B, H, H, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 100, (B, S)), jnp.int32),
        "bbox_4p_normalized": jnp.asarray(quad),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "bbox": jnp.asarray(bbox, jnp.int32),
        "first_token_idxes": jnp.asarray(rng.integers(0, S, (B, N)), jnp.int32),
        "block_mask": jnp.ones((B, N), jnp.int32),
        "line_rank_id": jnp.asarray(rng.integers(0, 16, (B, S)), jnp.int32),
        "line_rank_inner_id": jnp.asarray(rng.integers(0, 3, (B, S)), jnp.int32),
    }


class TestSinusoids:
    def test_1d_shape_and_values(self):
        pos = jnp.asarray([0.0, 1.0])
        emb = sinusoid_1d(pos, 8)
        assert emb.shape == (2, 8)
        np.testing.assert_allclose(np.asarray(emb[0, :4]), 0.0, atol=1e-6)  # sin(0)
        np.testing.assert_allclose(np.asarray(emb[0, 4:]), 1.0, atol=1e-6)  # cos(0)

    def test_2d_shape(self):
        bbox = jnp.zeros((3, 5, 8))
        assert sinusoid_2d(bbox, 64).shape == (3, 5, 64)


class TestConvNeXt:
    def test_stage_shapes(self):
        m = ConvNeXt(TINY_CONVNEXT, policy=FP32_POLICY)
        x = jnp.zeros((1, 64, 64, 3))
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        feats = m.apply({"params": params}, x)
        assert [f.shape for f in feats] == [
            (1, 16, 16, 8), (1, 8, 8, 16), (1, 4, 4, 32), (1, 2, 2, 64)]


class TestRoiFeature:
    def test_exact_roi_align_block_feature(self):
        feat = jnp.zeros((1, 4, 4, 1)).at[0, 1, 2, 0].set(8.0)
        # box covering exactly cell (2,1) in a 1000-coord space:
        # x 500-750, y 250-500 → feature box x 2-3, y 1-2 (scale 4/1000);
        # 1x1 adaptive roi_align samples the box center (2.5, 1.5) →
        # bilinear of cells (1,2),(1,3),(2,2),(2,3) = (8+0+0+0)/4
        boxes = jnp.asarray([[[500.0, 250.0, 750.0, 500.0]]])
        out = roi_block_feature(feat, boxes)
        assert float(out[0, 0, 0]) == pytest.approx(2.0, abs=1e-5)


@pytest.fixture(scope="module")
def tiny_geo():
    model = GeoLayoutLM(TINY, policy=FP32_POLICY)
    batch = _batch()
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    return model, params, batch


class TestGeoLayoutLM:
    def test_output_shapes(self, tiny_geo):
        model, params, batch = tiny_geo
        out = model.apply({"params": params}, batch)
        B, S = batch["input_ids"].shape
        N = batch["first_token_idxes"].shape[1]
        assert out["logits4labeling"].shape == (B, S, 7)
        assert out["logits4linking_list"][0].shape == (B, N, N)
        assert out["logits4linking_list"][1].shape == (B, N, N)
        assert out["pred4linking"].shape == (B, N, N)

    def test_attention_mask_blocks_tokens(self, tiny_geo):
        model, params, batch = tiny_geo
        out1 = model.apply({"params": params}, batch)
        b2 = dict(batch)
        b2["attention_mask"] = batch["attention_mask"].at[:, 8:].set(0)
        b2["input_ids"] = batch["input_ids"].at[:, 8:].set(5)
        out2 = model.apply({"params": params}, b2)
        b3 = dict(b2)
        b3["input_ids"] = b2["input_ids"].at[:, 8:].set(9)  # change masked tokens
        out3 = model.apply({"params": params}, b3)
        np.testing.assert_allclose(np.asarray(out2["logits4labeling"][:, :8]),
                                   np.asarray(out3["logits4labeling"][:, :8]),
                                   atol=1e-4)

    def test_losses(self, tiny_geo):
        model, params, batch = tiny_geo
        out = model.apply({"params": params}, batch)
        B, S = batch["input_ids"].shape
        N = batch["first_token_idxes"].shape[1]
        rng = np.random.default_rng(1)
        tb = dict(batch)
        tb["bio_labels"] = jnp.asarray(rng.integers(0, 7, (B, S)), jnp.int32
                                       ).at[:, -3:].set(-100)
        tb["el_labels_blk"] = jnp.asarray(rng.integers(0, 2, (B, N, N)), jnp.int32)
        tb["el_label_blk_mask"] = jnp.ones((B, N, N))
        losses = geolayoutlm_losses(out, tb)
        assert np.isfinite(float(losses["loss"]))
        assert float(losses["labeling_loss"]) > 0

    def test_jit(self, tiny_geo):
        model, params, batch = tiny_geo
        f = jax.jit(lambda p, b: model.apply({"params": p}, b))
        out = f(params, batch)
        assert np.isfinite(np.asarray(out["logits4labeling"])).all()
