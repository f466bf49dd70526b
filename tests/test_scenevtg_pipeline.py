"""SceneVTG proposal pipeline: bezier geometry + parsing + filtering
(reference AIGC/SceneVTG/TRCG/inference.py + bezier_utils.py)."""

import numpy as np
import pytest

from advancedliteratemachinery_tpu.pipelines.scenevtg import (
    SceneVTGProposer, bezier_fit_cubic, bezier_points, bezier_to_polygon,
    filter_overlaps, overlay_indices, parse_region_proposals, polygon_iou,
    split_words)

pytestmark = pytest.mark.fast


def straight_layout(x0, y0, x1, y1, h):
    """Axis-aligned rectangle as a 16-coord bezier layout (degenerate
    straight curves: control points evenly spaced on each edge)."""
    top = [x0 + (x1 - x0) * t for t in (0, 1 / 3, 2 / 3, 1)]
    out = []
    for x in top:
        out += [x, y0]
    for x in top:
        out += [x, y0 + h]
    return out


class TestBezier:
    def test_fit_roundtrip_on_bezier_samples(self):
        # chord-length parameterization (the reference's) is not the
        # uniform-t the samples came from, so control points only match
        # approximately — assert the refit CURVE overlays the samples
        cpts = np.array([[0, 0], [10, 5], [20, -5], [30, 0]], np.float64)
        pts = bezier_points(cpts.reshape(-1), n=50)
        fit = bezier_fit_cubic(pts[:, 0], pts[:, 1])
        np.testing.assert_allclose(fit, cpts, atol=0.2)
        refit = bezier_points(fit.reshape(-1), n=50)
        assert np.abs(refit - pts).max() < 0.1

    def test_degenerate_returns_none(self):
        assert bezier_fit_cubic(np.zeros(4), np.zeros(4)) is None

    def test_straight_layout_polygon(self):
        poly = bezier_to_polygon(straight_layout(0, 0, 100, 0, 20))
        assert poly.shape == (40, 2)
        np.testing.assert_allclose(poly[:20, 1], 0, atol=1e-9)
        np.testing.assert_allclose(poly[20:, 1], 20, atol=1e-9)


class TestIoU:
    def test_identical_boxes(self):
        p = bezier_to_polygon(straight_layout(0, 0, 50, 0, 10))
        assert polygon_iou(p, p) == pytest.approx(1.0, abs=1e-6)

    def test_disjoint(self):
        a = bezier_to_polygon(straight_layout(0, 0, 50, 0, 10))
        b = bezier_to_polygon(straight_layout(0, 100, 50, 100, 10))
        assert polygon_iou(a, b) == 0.0

    def test_half_overlap(self):
        a = bezier_to_polygon(straight_layout(0, 0, 100, 0, 10))
        b = bezier_to_polygon(straight_layout(50, 0, 150, 0, 10))
        assert polygon_iou(a, b) == pytest.approx(1 / 3, abs=0.02)

    def test_overlay_indices_and_filter(self):
        layouts = [straight_layout(0, 0, 100, 0, 10),
                   straight_layout(50, 0, 150, 0, 10),
                   straight_layout(0, 50, 100, 50, 10)]
        pairs = overlay_indices(layouts)
        assert pairs == [(0, 1)]
        props = [{"layout": l, "text": f"t{i}"}
                 for i, l in enumerate(layouts)]
        kept = filter_overlaps(props)
        assert len(kept) == 2
        assert any(p["text"] == "t2" for p in kept)


class TestParse:
    def test_valid_literal(self):
        s = ("[{'layout': " + str(list(range(16))) +
             ", 'text': 'hello'}]</s>.")
        out = parse_region_proposals(s)
        assert len(out) == 1
        assert out[0]["text"] == "hello"
        assert out[0]["layout"] == [float(v) for v in range(16)]

    def test_malformed_returns_empty(self):
        assert parse_region_proposals("not a list") == []
        assert parse_region_proposals("[{'layout': [1,2], 'text': 'x'}]") == []
        # literal_eval must NOT execute code (the reference uses eval())
        assert parse_region_proposals("__import__('os').getcwd()") == []


class TestSplitWords:
    def test_single_word_passthrough(self):
        lay = straight_layout(0, 0, 90, 0, 10)
        out = split_words(lay, "word")
        assert out == [(lay, "word")]

    def test_two_words_split_proportionally(self):
        # "abcd ef": weights 4,1,2 → x splits ~ at 4/7 and 5/7 of 140
        lay = straight_layout(0, 0, 140, 0, 10)
        out = split_words(lay, "abcd ef")
        assert [w for _, w in out] == ["abcd", "ef"]
        l1, l2 = out[0][0], out[1][0]
        assert l1[0] == pytest.approx(0, abs=1.0)       # first word starts at 0
        assert l1[6] == pytest.approx(80, abs=3.0)      # ends near 4/7*140
        assert l2[0] == pytest.approx(100, abs=3.0)     # second starts near 5/7
        assert l2[6] == pytest.approx(140, abs=1.5)


class TestProposerEndToEnd:
    def test_two_turn_protocol_with_stub_model(self):
        answer = ("[{'layout': " +
                  str(straight_layout(0, 0, 100, 0, 10)) +
                  ", 'text': 'stop sign'}]</s>.")

        class StubTok:
            def encode(self, s):
                return [1] * min(len(s), 8)

            def decode(self, ids):
                return "regions noted" if len(ids) == 3 else answer

        calls = []

        def gen(images, ids):
            calls.append(ids.shape)
            return np.zeros((1, 3 if len(calls) == 1 else 5), np.int32)

        prop = SceneVTGProposer(gen, StubTok(), with_word=True)
        out = prop(np.zeros((32, 32, 3), np.float32),
                   ["where is text?", "give layouts"])
        assert len(calls) == 2
        assert [p["text"] for p in out] == ["stop", "sign"]


class TestTwoStagePipeline:
    def test_compose_with_stub_renderer(self):
        from advancedliteratemachinery_tpu.pipelines.scenevtg import (
            SceneVTGPipeline, rasterize_polygon_mask, render_text_template)

        # stub proposer returning one straight region
        lay = straight_layout(10, 10, 90, 10, 16)

        def proposer(image, questions):
            return [{"layout": lay, "text": "hi"}]

        calls = {}

        def render_fn(conditions):
            calls.update({k: np.asarray(v).shape
                          for k, v in conditions.items()})
            return np.ones((1, 64, 256, 3), np.float32)  # pure white

        pipe = SceneVTGPipeline(proposer, render_fn,
                                encode_text=lambda t: [ord(c) % 90
                                                       for c in t.ljust(8)])
        img = np.zeros((128, 128, 3), np.float32)
        out = pipe(img, ["q1", "q2"])

        assert calls["images_style"] == (1, 64, 256, 3)
        assert calls["line_poly_mask"] == (1, 64, 256, 1)
        assert calls["text_ids"] == (1, 8)
        # region became white, outside untouched
        assert out["image"][18, 50].mean() > 0.9
        assert out["image"][120, 120].mean() == 0.0
        assert out["regions"][0]["text"] == "hi"

    def test_mask_and_template_helpers(self):
        from advancedliteratemachinery_tpu.pipelines.scenevtg import (
            rasterize_polygon_mask, render_text_template)

        m = rasterize_polygon_mask(
            np.asarray([[0, 0], [10, 0], [10, 10], [0, 10]]), (20, 20))
        assert m[5, 5] == 1.0 and m[15, 15] == 0.0
        t = render_text_template("abc", (32, 64))
        assert t.shape == (32, 64, 3)
        assert t.max() > 0.5  # glyphs present
