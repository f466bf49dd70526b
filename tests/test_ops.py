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


class TestDCNHandDerivedFixture:
    """Non-zero-offset numeric parity fixture (VERDICT r1 item 9).

    Pencil-and-paper bilinear expectations against the reference CUDA
    semantics (dcn_v2_im2col_cuda.cu `dmcn_im2col_bilinear`): zero-padded
    boundary, per-corner validity on -1 < y < H, -1 < x < W, modulation
    multiplies the sampled value. Input is a 2x2 single-channel image
      x = [[1, 2],
           [3, 4]]
    with a 1x1 kernel, weight 1, stride 1, pad 0 -> Ho=Wo=2, one tap per
    output position; the offset at each position is chosen so every
    boundary case is hit and the expected value is hand-computable.
    """

    def _run(self, offsets, mask=None):
        x = jnp.asarray([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
        w = jnp.ones((1, 1, 1, 1), jnp.float32)
        off = jnp.asarray(offsets, jnp.float32).reshape(1, 2, 2, 1, 2)
        m = (jnp.ones((1, 2, 2, 1), jnp.float32) if mask is None
             else jnp.asarray(mask, jnp.float32).reshape(1, 2, 2, 1))
        out = deform_conv2d(x, off, m, w, None, stride=1, padding=0)
        return np.asarray(out).reshape(2, 2)

    def test_interior_fractional_offsets(self):
        # (0,0): base (0,0) + (0.5,0.5)  -> sample (0.5,0.5)
        #        = .25*1 + .25*2 + .25*3 + .25*4                 = 2.5
        # (0,1): base (0,1) + (0.25,-0.75) -> (0.25,0.25)
        #        = .75*.75*1 + .75*.25*2 + .25*.75*3 + .25*.25*4 = 1.75
        # (1,0): base (1,0) + (-0.5,0.25) -> (0.5,0.25)
        #        = .5*.75*1 + .5*.25*2 + .5*.75*3 + .5*.25*4     = 2.25
        # (1,1): base (1,1) + (0,0)       -> (1,1) exact grid    = 4
        out = self._run([[[0.5, 0.5]], [[0.25, -0.75]],
                         [[-0.5, 0.25]], [[0.0, 0.0]]])
        np.testing.assert_allclose(out, [[2.5, 1.75], [2.25, 4.0]], atol=1e-6)

    def test_boundary_partial_validity(self):
        # (0,0): sample (-0.5, 0): y0=-1 invalid, y1=0 valid
        #        -> wy1 * x[0,0] = 0.5 * 1                       = 0.5
        # (0,1): sample (0, 1.5): x0=1 valid, x1=2 invalid
        #        -> wx0 * x[0,1] = 0.5 * 2                       = 1.0
        # (1,0): sample (1.5, -0.5): only corner (1,0) valid,
        #        weight wy0*wx1 = .5*.5 -> 0.25 * 3              = 0.75
        # (1,1): sample (1.5, 1.5): only corner (1,1) valid
        #        -> 0.25 * 4                                     = 1.0
        out = self._run([[[-0.5, 0.0]], [[-0.0, 0.5]],
                         [[0.5, -0.5]], [[0.5, 0.5]]])
        np.testing.assert_allclose(out, [[0.5, 1.0], [0.75, 1.0]], atol=1e-6)

    def test_fully_outside_is_zero_and_mask_scales(self):
        # (0,0): sample (-2,-2) fully outside -> 0 (CUDA: -1 < y guard)
        # others: exact grid points, modulated by mask 0.5
        out = self._run(
            [[[-2.0, -2.0]], [[0.0, 0.0]], [[0.0, 0.0]], [[0.0, 0.0]]],
            mask=[1.0, 0.5, 0.5, 2.0],
        )
        np.testing.assert_allclose(out, [[0.0, 1.0], [1.5, 8.0]], atol=1e-6)

    def test_3x3_tap_positions_with_padding(self):
        # 3x3 kernel, pad 1, zero offsets: out(0,0) = sum over the 4
        # in-bounds taps of x = 1+2+3+4 = 10 with all-ones weights; with
        # offset (0.5, 0.5) on EVERY tap, each tap k samples at
        # (ky-1+0.5, kx-1+0.5); hand sum over the 9 taps:
        #   k=(0,0)->(-.5,-.5): .25*1          = 0.25
        #   k=(0,1)->(-.5,.5):  .25*1 + .25*2  = 0.75
        #   k=(0,2)->(-.5,1.5): .25*2          = 0.5
        #   k=(1,0)->(.5,-.5):  .25*1 + .25*3  = 1.0
        #   k=(1,1)->(.5,.5):   2.5
        #   k=(1,2)->(.5,1.5):  .25*2 + .25*4  = 1.5
        #   k=(2,0)->(1.5,-.5): .25*3          = 0.75
        #   k=(2,1)->(1.5,.5):  .25*3 + .25*4  = 1.75
        #   k=(2,2)->(1.5,1.5): .25*4          = 1.0
        # total = 10.0
        x = jnp.asarray([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
        w = jnp.ones((3, 3, 1, 1), jnp.float32)
        m = jnp.ones((1, 2, 2, 9), jnp.float32)
        off0 = jnp.zeros((1, 2, 2, 9, 2), jnp.float32)
        out0 = np.asarray(deform_conv2d(x, off0, m, w, None, stride=1, padding=1))
        np.testing.assert_allclose(out0.reshape(2, 2), [[10, 10], [10, 10]], atol=1e-5)
        off = jnp.full((1, 2, 2, 9, 2), 0.5, jnp.float32)
        out = np.asarray(deform_conv2d(x, off, m, w, None, stride=1, padding=1))
        assert out.reshape(2, 2)[0, 0] == pytest.approx(10.0, abs=1e-5)


class TestWarpQuadCrops:
    def test_full_image_identity(self):
        from advancedliteratemachinery_tpu.ops.image import warp_quad_crops

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (1, 8, 12, 3), dtype=np.uint8)
        quad = np.array([[[[0, 0], [12, 0], [12, 8], [0, 8]]]], np.float32)
        out = np.asarray(warp_quad_crops(jnp.asarray(img), jnp.asarray(quad),
                                         out_hw=(8, 12), dtype=jnp.float32))
        want = img[0].astype(np.float32) * (2.0 / 255.0) - 1.0
        np.testing.assert_allclose(out[0, 0], want, atol=1e-5)

    def test_axis_aligned_subrect_matches_numpy(self):
        from advancedliteratemachinery_tpu.ops.image import warp_quad_crops

        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (1, 16, 16, 1), dtype=np.uint8)
        # rect x in [4,8), y in [2,6) at output 4x4 → identity on that region
        quad = np.array([[[[4, 2], [8, 2], [8, 6], [4, 6]]]], np.float32)
        out = np.asarray(warp_quad_crops(jnp.asarray(img), jnp.asarray(quad),
                                         out_hw=(4, 4), dtype=jnp.float32))
        want = img[0, 2:6, 4:8].astype(np.float32) * (2.0 / 255.0) - 1.0
        np.testing.assert_allclose(out[0, 0], want, atol=1e-5)

    def test_parallelogram_bilinear_oracle(self):
        from advancedliteratemachinery_tpu.ops.image import warp_quad_crops

        img = np.zeros((1, 6, 6, 1), np.uint8)
        img[0, :, :, 0] = np.arange(36).reshape(6, 6)
        # 1-output-pixel crop centered mid-quad: sample at centroid
        quad = np.array([[[[1, 1], [4, 1], [5, 4], [2, 4]]]], np.float32)
        out = np.asarray(warp_quad_crops(jnp.asarray(img), jnp.asarray(quad),
                                         out_hw=(1, 1), dtype=jnp.float32))
        # u=v=0.5 → src = mean of corners = (3.0, 2.5) → index (x=2.5, y=2.0)
        # fy=0 → row 2 only; fx=0.5 → mean of cols 2,3: (14+15)/2
        want = 14.5 * (2.0 / 255.0) - 1.0
        np.testing.assert_allclose(out[0, 0, 0, 0, 0], want, atol=1e-5)


class TestCropRects:
    def test_matches_warp_quad_crops_axis_aligned(self):
        from advancedliteratemachinery_tpu.ops.image import (
            crop_rects, warp_quad_crops)

        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (2, 32, 48, 3), dtype=np.uint8)
        q = np.zeros((2, 3, 4, 2), np.float32)
        for p in range(2):
            for k in range(3):
                x0 = rng.uniform(1, 20); y0 = rng.uniform(1, 12)
                bw = rng.uniform(5, 20); bh = rng.uniform(4, 12)
                q[p, k] = [[x0, y0], [x0 + bw, y0], [x0 + bw, y0 + bh],
                           [x0, y0 + bh]]
        want = np.asarray(warp_quad_crops(
            jnp.asarray(img), jnp.asarray(q), out_hw=(8, 16),
            dtype=jnp.float32))
        got = np.asarray(crop_rects(
            jnp.asarray(img), jnp.asarray(q), out_hw=(8, 16),
            dtype=jnp.float32, patch_hw=(16, 24)))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestDeformConvPerTap:
    """per_tap accumulation must equal the im2col contraction exactly —
    same gathers, same math, different scheduling."""

    def test_per_tap_equals_im2col(self):
        import jax
        import jax.numpy as jnp

        from advancedliteratemachinery_tpu.ops.deform_conv import (
            deform_conv2d)

        rng = np.random.default_rng(0)
        B, H, W, Cin, Cout = 2, 9, 11, 5, 7
        x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.float32)
        offs = jnp.asarray(rng.uniform(-2, 2, (B, H, W, 9, 2)), jnp.float32)
        mask = jnp.asarray(rng.uniform(0, 1, (B, H, W, 9)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((Cout,)), jnp.float32)
        a = deform_conv2d(x, offs, mask, w, b, per_tap=True)
        c = deform_conv2d(x, offs, mask, w, b, per_tap=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-5)

    def test_per_tap_strided(self):
        import jax.numpy as jnp

        from advancedliteratemachinery_tpu.ops.deform_conv import (
            deform_conv2d)

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 12, 12, 4)), jnp.float32)
        Ho = Wo = 6
        offs = jnp.asarray(rng.uniform(-1, 1, (1, Ho, Wo, 9, 2)),
                           jnp.float32)
        mask = jnp.ones((1, Ho, Wo, 9), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 4, 8)), jnp.float32)
        a = deform_conv2d(x, offs, mask, w, stride=2, per_tap=True)
        c = deform_conv2d(x, offs, mask, w, stride=2, per_tap=False)
        assert a.shape == (1, 6, 6, 8)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-5)


class TestUpsampleShuffle:
    """Phase-decomposed UpsampleBilinear must equal the literal
    lhs-dilated transposed conv for every factor the DLA necks use."""

    @pytest.mark.parametrize("f,H,W,C", [(2, 7, 9, 3), (4, 5, 6, 2),
                                         (8, 3, 4, 1)])
    def test_shuffle_equals_dilated(self, f, H, W, C):
        import jax
        import jax.numpy as jnp

        from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
        from advancedliteratemachinery_tpu.models.dla import UpsampleBilinear

        rng = np.random.default_rng(f)
        x = jnp.asarray(rng.standard_normal((2, H, W, C)), jnp.float32)
        a_mod = UpsampleBilinear(factor=f, policy=FP32_POLICY, shuffle=True)
        b_mod = UpsampleBilinear(factor=f, policy=FP32_POLICY, shuffle=False)
        v = a_mod.init(jax.random.PRNGKey(0), x)
        # randomize the (trainable) kernel so the test is not
        # bilinear-symmetric by construction
        kern = jax.random.normal(jax.random.PRNGKey(1),
                                 v["params"]["kernel"].shape)
        v = {"params": {"kernel": kern}}
        a = a_mod.apply(v, x)
        b = b_mod.apply(v, x)
        assert a.shape == (2, f * H, f * W, C)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_flow_to_kernel(self):
        import jax
        import jax.numpy as jnp

        from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
        from advancedliteratemachinery_tpu.models.dla import UpsampleBilinear

        mod = UpsampleBilinear(factor=2, policy=FP32_POLICY)
        x = jnp.ones((1, 4, 4, 2))
        v = mod.init(jax.random.PRNGKey(0), x)
        g = jax.grad(lambda p: mod.apply({"params": p}, x).sum())(v["params"])
        assert float(jnp.abs(g["kernel"]).sum()) > 0
