import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.ops.deform_conv import (
    DeformConv2d,
    bilinear_gather,
    deform_conv2d,
)
from advancedliteratemachinery_tpu.ops.heatmap import (
    corner_decode,
    ctdet_4ps_decode,
    gather_feat,
    heatmap_peaks,
    topk_peaks,
)
from advancedliteratemachinery_tpu.ops.nms import (
    poly_nms,
    quad_iou,
    shoelace_area,
    soft_nms_scores,
)


def _np_deform_conv(x, offsets, mask, weights, bias, stride, pad, dil):
    """NumPy oracle mirroring dcn_v2_im2col_cuda semantics."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weights.shape
    K = kh * kw
    Ho = (H + 2 * pad - dil * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * pad - dil * (kw - 1) - 1) // stride + 1
    out = np.zeros((B, Ho, Wo, Cout), np.float64)

    def sample(b, y, x_):
        y0, x0 = int(np.floor(y)), int(np.floor(x_))
        v = np.zeros((Cin,), np.float64)
        for (yy, xx, w) in [
            (y0, x0, (1 - (y - y0)) * (1 - (x_ - x0))),
            (y0, x0 + 1, (1 - (y - y0)) * (x_ - x0)),
            (y0 + 1, x0, (y - y0) * (1 - (x_ - x0))),
            (y0 + 1, x0 + 1, (y - y0) * (x_ - x0)),
        ]:
            if 0 <= yy < H and 0 <= xx < W:
                v += w * x[b, yy, xx]
        return v

    for b in range(B):
        for oy in range(Ho):
            for ox in range(Wo):
                acc = np.zeros((Cout,), np.float64)
                for ki in range(kh):
                    for kj in range(kw):
                        k = ki * kw + kj
                        y = oy * stride - pad + ki * dil + offsets[b, oy, ox, k, 0]
                        xx = ox * stride - pad + kj * dil + offsets[b, oy, ox, k, 1]
                        v = sample(b, y, xx) * mask[b, oy, ox, k]
                        acc += v @ weights[ki, kj]
                out[b, oy, ox] = acc + bias
    return out


class TestDeformConv:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 6, 7, 3)).astype(np.float32)
        off = (rng.standard_normal((1, 6, 7, 9, 2)) * 1.5).astype(np.float32)
        mask = rng.uniform(0, 1, (1, 6, 7, 9)).astype(np.float32)
        w = rng.standard_normal((3, 3, 3, 4)).astype(np.float32) * 0.2
        b = rng.standard_normal((4,)).astype(np.float32)
        got = deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(mask),
                            jnp.asarray(w), jnp.asarray(b), 1, 1, 1)
        want = _np_deform_conv(x, off, mask, w, b, 1, 1, 1)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_zero_offset_unit_mask_equals_conv(self):
        """DCNv2's own gradcheck strategy (DCNv2/testcuda.py:32
        check_zero_offset): zero offsets + mask 1 == plain conv."""
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
        w = rng.standard_normal((3, 3, 4, 5)).astype(np.float32) * 0.2
        off = np.zeros((2, 8, 8, 9, 2), np.float32)
        mask = np.ones((2, 8, 8, 9), np.float32)
        got = deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(mask),
                            jnp.asarray(w), None, 1, 1, 1)
        want = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_stride2(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
        off = (rng.standard_normal((1, 4, 4, 9, 2)) * 0.5).astype(np.float32)
        mask = np.ones((1, 4, 4, 9), np.float32)
        w = rng.standard_normal((3, 3, 2, 3)).astype(np.float32)
        b = np.zeros((3,), np.float32)
        got = deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(mask),
                            jnp.asarray(w), jnp.asarray(b), 2, 1, 1)
        want = _np_deform_conv(x, off, mask, w, b, 2, 1, 1)
        assert got.shape == (1, 4, 4, 3)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_module_grad_flows(self):
        m = DeformConv2d(8)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
        params = m.init(jax.random.PRNGKey(1), x)["params"]

        def loss(p):
            return jnp.sum(m.apply({"params": p}, x) ** 2)

        g = jax.grad(loss)(params)
        gn = jnp.sqrt(sum(jnp.sum(v ** 2) for v in jax.tree.leaves(g)))
        assert np.isfinite(float(gn)) and float(gn) > 0

    def test_bilinear_gather_exact_grid(self):
        x = jnp.arange(12.0).reshape(1, 3, 4, 1)
        ys = jnp.asarray([[1.0, 2.0]])
        xs = jnp.asarray([[2.0, 3.0]])
        out = bilinear_gather(x, ys, xs)
        np.testing.assert_allclose(np.asarray(out[0, :, 0]), [6.0, 11.0])

    def test_bilinear_gather_outside_zero(self):
        x = jnp.ones((1, 3, 3, 1))
        out = bilinear_gather(x, jnp.asarray([[-5.0]]), jnp.asarray([[1.0]]))
        np.testing.assert_allclose(np.asarray(out), 0.0)


class TestHeatmapDecode:
    def test_peaks_suppress_non_maxima(self):
        h = np.zeros((1, 8, 8, 1), np.float32)
        h[0, 3, 3, 0] = 0.9
        h[0, 3, 4, 0] = 0.5  # adjacent, suppressed
        out = np.asarray(heatmap_peaks(jnp.asarray(h)))
        assert out[0, 3, 3, 0] == pytest.approx(0.9)
        assert out[0, 3, 4, 0] == 0.0

    def test_topk_positions(self):
        h = np.zeros((1, 8, 10, 2), np.float32)
        h[0, 2, 3, 0] = 0.9
        h[0, 5, 7, 1] = 0.8
        h[0, 1, 1, 0] = 0.7
        r = topk_peaks(jnp.asarray(h), k=3)
        assert r["scores"][0].tolist() == pytest.approx([0.9, 0.8, 0.7])
        assert r["xs"][0].tolist() == [3.0, 7.0, 1.0]
        assert r["ys"][0].tolist() == [2.0, 5.0, 1.0]
        assert r["clses"][0].tolist() == [0, 1, 0]

    def test_gather_feat(self):
        f = jnp.arange(24.0).reshape(1, 2, 3, 4)  # H=2,W=3,C=4
        inds = jnp.asarray([[4]])  # y=1,x=1 → flat 4
        out = gather_feat(f, inds)
        np.testing.assert_allclose(np.asarray(out[0, 0]), [16, 17, 18, 19])

    def test_ctdet_4ps_decode_shapes_and_box(self):
        H, W = 16, 16
        heat = np.zeros((1, H, W, 1), np.float32)
        heat[0, 8, 8, 0] = 0.95
        wh = np.zeros((1, H, W, 8), np.float32)
        # corners at center ± 2 (wh = center - corner offsets)
        wh[0, 8, 8] = [2, 2, -2, 2, -2, -2, 2, -2]
        ax = np.zeros((1, H, W, 16), np.float32)
        cr = np.zeros((1, H, W, 16), np.float32)
        reg = np.zeros((1, H, W, 2), np.float32)
        out = ctdet_4ps_decode(jnp.asarray(heat), jnp.asarray(wh), jnp.asarray(ax),
                               jnp.asarray(cr), jnp.asarray(reg), k=4)
        det = np.asarray(out["detections"])
        assert det.shape == (1, 4, 10)
        assert det[0, 0, 8] == pytest.approx(0.95)  # score
        np.testing.assert_allclose(det[0, 0, :8], [6, 6, 10, 6, 10, 10, 6, 10])

    def test_corner_decode(self):
        H, W = 16, 16
        mk = np.zeros((1, H, W, 1), np.float32)
        mk[0, 4, 4, 0] = 0.9
        st = np.zeros((1, H, W, 8), np.float32)
        out = corner_decode(jnp.asarray(mk), jnp.asarray(st), k=8)
        assert out["gboxes"].shape == (1, 8, 8)
        assert float(out["scores"][0, 0, 0]) == pytest.approx(0.9)


def _np_quad_iou(q1, q2):
    """Oracle via dense rasterization."""
    from matplotlib.path import Path

    n = 400
    lo = min(q1.min(), q2.min()) - 1
    hi = max(q1.max(), q2.max()) + 1
    xs = np.linspace(lo, hi, n)
    ys = np.linspace(lo, hi, n)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], -1)
    in1 = Path(q1).contains_points(pts)
    in2 = Path(q2).contains_points(pts)
    inter = np.sum(in1 & in2)
    union = np.sum(in1 | in2)
    return inter / union


class TestQuadIoU:
    def test_identical(self):
        q = jnp.asarray([[0.0, 0], [4, 0], [4, 4], [0, 4]])
        assert float(quad_iou(q, q)) == pytest.approx(1.0, abs=1e-5)

    def test_disjoint(self):
        q1 = jnp.asarray([[0.0, 0], [1, 0], [1, 1], [0, 1]])
        q2 = jnp.asarray([[5.0, 5], [6, 5], [6, 6], [5, 6]])
        assert float(quad_iou(q1, q2)) == pytest.approx(0.0, abs=1e-6)

    def test_half_overlap_rect(self):
        q1 = jnp.asarray([[0.0, 0], [4, 0], [4, 4], [0, 4]])
        q2 = jnp.asarray([[2.0, 0], [6, 0], [6, 4], [2, 4]])
        # inter 8, union 24
        assert float(quad_iou(q1, q2)) == pytest.approx(8 / 24, abs=1e-5)

    def test_clockwise_input_ok(self):
        q1 = jnp.asarray([[0.0, 0], [0, 4], [4, 4], [4, 0]])  # clockwise
        q2 = jnp.asarray([[2.0, 0], [6, 0], [6, 4], [2, 4]])
        assert float(quad_iou(q1, q2)) == pytest.approx(8 / 24, abs=1e-5)

    def test_rotated_vs_rasterization(self):
        rng = np.random.default_rng(3)
        for _ in range(4):
            c = rng.uniform(2, 6, 2)
            ang = rng.uniform(0, np.pi / 2)
            w, h = rng.uniform(1.5, 4, 2)
            rot = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
            base = np.array([[-w, -h], [w, -h], [w, h], [-w, h]]) / 2
            q1 = base @ rot.T + c
            q2 = base @ rot.T * 1.3 + c + rng.uniform(-1, 1, 2)
            got = float(quad_iou(jnp.asarray(q1), jnp.asarray(q2)))
            want = _np_quad_iou(q1, q2)
            assert got == pytest.approx(want, abs=0.02)


class TestPolyNMS:
    def test_greedy_suppression(self):
        # three boxes: two heavily overlapping, one far away
        b1 = [0, 0, 4, 0, 4, 4, 0, 4]
        b2 = [0.5, 0, 4.5, 0, 4.5, 4, 0.5, 4]
        b3 = [10, 10, 14, 10, 14, 14, 10, 14]
        boxes = jnp.asarray([b1, b2, b3], jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7])
        keep = np.asarray(poly_nms(boxes, scores, 0.3))
        np.testing.assert_array_equal(keep, [True, False, True])

    def test_soft_nms_decays(self):
        b1 = [0, 0, 4, 0, 4, 4, 0, 4]
        b2 = [0.5, 0, 4.5, 0, 4.5, 4, 0.5, 4]
        boxes = jnp.asarray([b1, b2], jnp.float32)
        scores = jnp.asarray([0.9, 0.8])
        out = np.asarray(soft_nms_scores(boxes, scores))
        assert out[0] == pytest.approx(0.9)
        assert out[1] < 0.5
