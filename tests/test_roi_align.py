"""Exact RoIAlign vs a numpy oracle implementing the torchvision CUDA
kernel semantics (torchvision/csrc/ops/cuda/roi_align_kernel.cu), plus a
hand-derived fixture. VERDICT r1 item 7."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.ops.roi_align import roi_align


def _np_bilinear(feat, y, x):
    H, W, C = feat.shape
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros((C,), np.float64)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low, x_low = int(y), int(x)
    if y_low >= H - 1:
        y_high = y_low = H - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= W - 1:
        x_high = x_low = W - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    return (feat[y_low, x_low] * (1 - ly) * (1 - lx)
            + feat[y_low, x_high] * (1 - ly) * lx
            + feat[y_high, x_low] * ly * (1 - lx)
            + feat[y_high, x_high] * ly * lx)


def _np_roi_align(feat, boxes, out_hw, scale, sampling_ratio=-1,
                  aligned=False):
    H, W, C = feat.shape
    oh, ow = out_hw
    out = np.zeros((len(boxes), oh, ow, C), np.float64)
    off = 0.5 if aligned else 0.0
    for n, (x1, y1, x2, y2) in enumerate(boxes):
        sx1, sy1 = x1 * scale - off, y1 * scale - off
        sx2, sy2 = x2 * scale - off, y2 * scale - off
        rw, rh = sx2 - sx1, sy2 - sy1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / ow, rh / oh
        gh = sampling_ratio if sampling_ratio > 0 else math.ceil(rh / oh)
        gw = sampling_ratio if sampling_ratio > 0 else math.ceil(rw / ow)
        for ph in range(oh):
            for pw in range(ow):
                acc = np.zeros((C,), np.float64)
                for iy in range(gh):
                    yy = sy1 + ph * bh + (iy + 0.5) * bh / gh
                    for ix in range(gw):
                        xx = sx1 + pw * bw + (ix + 0.5) * bw / gw
                        acc += _np_bilinear(feat, yy, xx)
                out[n, ph, pw] = acc / (gh * gw)
    return out


class TestRoiAlign:
    @pytest.mark.parametrize("out_hw,sr", [((1, 1), -1), ((1, 1), 2),
                                           ((2, 2), -1), ((3, 2), 1)])
    def test_matches_numpy_oracle(self, out_hw, sr):
        rng = np.random.default_rng(0)
        feat = rng.standard_normal((10, 12, 3)).astype(np.float32)
        boxes = np.array([
            [1.0, 2.0, 5.0, 7.0],
            [0.3, 0.7, 2.2, 3.9],       # fractional
            [8.0, 6.0, 14.0, 13.0],     # spills past the border (grid <= 8)
            [4.0, 4.0, 4.5, 4.2],       # sub-pixel (clamped to 1.0 size)
        ], np.float32)
        scale = 0.5
        want = _np_roi_align(feat, boxes * 2.0, out_hw, scale,
                             sampling_ratio=sr)
        got = roi_align(jnp.asarray(feat)[None],
                        jnp.asarray(boxes * 2.0)[None],
                        out_hw=out_hw, spatial_scale=scale,
                        sampling_ratio=sr, max_grid=8)
        np.testing.assert_allclose(np.asarray(got)[0], want,
                                   rtol=1e-5, atol=1e-5)

    def test_aligned_true_oracle(self):
        rng = np.random.default_rng(1)
        feat = rng.standard_normal((8, 8, 2)).astype(np.float32)
        boxes = np.array([[1.0, 1.0, 6.0, 5.0]], np.float32)
        want = _np_roi_align(feat, boxes, (2, 2), 1.0, aligned=True)
        got = roi_align(jnp.asarray(feat)[None], jnp.asarray(boxes)[None],
                        out_hw=(2, 2), spatial_scale=1.0, aligned=True)
        np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-5,
                                   atol=1e-5)

    def test_hand_fixture_1x1(self):
        """2x2 constant-gradient map, unit box centered: 1x1 output with
        adaptive grid 1 samples the box center → plain bilinear value.
        Box (0.5,0.5)-(1.5,1.5) scale 1 (roi 1x1, grid 1): sample at
        (1.0, 1.0) → feat[1,1]."""
        feat = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)[..., None]
        boxes = np.array([[0.5, 0.5, 1.5, 1.5]], np.float32)
        got = roi_align(jnp.asarray(feat)[None], jnp.asarray(boxes)[None],
                        out_hw=(1, 1), spatial_scale=1.0)
        assert float(got[0, 0, 0, 0, 0]) == pytest.approx(4.0, abs=1e-6)

    def test_geolayoutlm_call_shape(self):
        """The GeoLayoutLM usage: 1x1, spatial_scale=W_f/1000, boxes in
        0..1000 (modeling_bros_convnext.py:126)."""
        rng = np.random.default_rng(2)
        feat = rng.standard_normal((1, 56, 56, 4)).astype(np.float32)
        boxes = rng.uniform(0, 1000, (1, 7, 4)).astype(np.float32)
        boxes = np.concatenate([np.minimum(boxes[..., :2], boxes[..., 2:]),
                                np.maximum(boxes[..., :2], boxes[..., 2:])], -1)
        out = roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                        out_hw=(1, 1), spatial_scale=56 / 1000.0)
        assert out.shape == (1, 7, 1, 1, 4)
        assert np.isfinite(np.asarray(out)).all()
