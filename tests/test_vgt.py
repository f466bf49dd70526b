import jax
import jax.numpy as jnp
import numpy as np

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.models.vgt import (
    VGTBackbone,
    VGTConfig,
    VGTDetector,
    rasterize_word_grid,
)

TINY = VGTConfig(img_size=(64, 64), patch_size=16, embed_dim=32, self_depth=1,
                 cross_depth=4, num_heads=2, grid_embedding_dim=8,
                 vocab_size=100, fpn_dim=16, num_classes=5)


class TestWordGrid:
    def test_rasterize(self):
        grid = rasterize_word_grid([7, 9], [[0, 0, 10, 10], [20, 20, 30, 30]],
                                   height=40, width=40)
        assert grid.shape == (40, 40)
        assert grid[5, 5] == 7 and grid[25, 25] == 9 and grid[15, 15] == 0

    def test_rasterize_stride_and_clip(self):
        grid = rasterize_word_grid([3], [[-10, -10, 999, 999]], 40, 40, stride=2)
        assert grid.shape == (20, 20)
        assert (grid == 3).all()


class TestVGT:
    def test_backbone_pyramid(self):
        m = VGTBackbone(TINY, policy=FP32_POLICY)
        imgs = jnp.zeros((1, 64, 64, 3))
        grid = jnp.zeros((1, 64, 64), jnp.int32)
        variables = m.init(jax.random.PRNGKey(0), imgs, grid)
        out = m.apply(variables, imgs, grid)
        # patch grid 4x4 at 1/16 → p2 1/4 (16x16), p3 1/8, p4 1/16, p5 1/32
        assert out["p2"].shape == (1, 16, 16, 16)
        assert out["p3"].shape == (1, 8, 8, 16)
        assert out["p4"].shape == (1, 4, 4, 16)
        assert out["p5"].shape == (1, 2, 2, 16)
        assert out["p6"].shape == (1, 1, 1, 16)   # LastLevelMaxPool

    def test_grid_stream_contributes(self):
        m = VGTBackbone(TINY, policy=FP32_POLICY)
        imgs = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
        g1 = jnp.zeros((1, 64, 64), jnp.int32)
        g2 = jnp.full((1, 64, 64), 42, jnp.int32)
        variables = m.init(jax.random.PRNGKey(1), imgs, g1)
        o1 = m.apply(variables, imgs, g1)
        o2 = m.apply(variables, imgs, g2)
        assert not np.allclose(np.asarray(o1["p2"]), np.asarray(o2["p2"]))

    def test_detector_heads(self):
        m = VGTDetector(TINY, policy=FP32_POLICY)
        imgs = jnp.zeros((1, 64, 64, 3))
        grid = jnp.zeros((1, 64, 64), jnp.int32)
        variables = m.init(jax.random.PRNGKey(0), imgs, grid)
        out = jax.jit(lambda v, i, g: m.apply(v, i, g))(variables, imgs, grid)
        assert out["hm"].shape == (1, 16, 16, 5)
        assert out["wh"].shape == (1, 16, 16, 8)


class TestGridInput:
    """create_grid_input.py parity: subword bbox splitting + grid dict."""

    def test_readjust_splits_width_evenly(self):
        from advancedliteratemachinery_tpu.models.vgt import (
            readjust_bbox_coords)
        out = readjust_bbox_coords([(10, 5, 30, 8)], [[101, 102, 103]])
        assert len(out) == 3
        assert out[0] == (10, 5, 10, 8)
        assert out[1] == (20, 5, 10, 8)
        assert out[2] == (30, 5, 10, 8)

    def test_build_and_rasterize(self):
        from advancedliteratemachinery_tpu.models.vgt import (
            build_grid_input, grid_ids_from_words)

        words = [{"text": "ab", "x0": 0, "top": 0, "x1": 8, "bottom": 4},
                 {"text": "cd", "x0": 10, "top": 0, "x1": 14, "bottom": 4}]
        tok = lambda texts: [[5, 6] if t == "ab" else [7] for t in texts]
        g = build_grid_input(words, tok)
        assert g["input_ids"].tolist() == [5, 6, 7]
        assert g["bbox_subword_list"].shape == (3, 4)
        assert g["texts"] == ["ab", "cd"]

        grid = grid_ids_from_words(words, tok, height=8, width=16)
        assert grid.shape == (8, 16)
        assert grid[1, 1] == 5 and grid[1, 6] == 6 and grid[1, 12] == 7
        assert grid[6, 1] == 0
