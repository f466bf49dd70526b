import numpy as np
import pytest
from PIL import Image

from advancedliteratemachinery_tpu.data.augment import GROUPS, RandAugment


def _img():
    rng = np.random.default_rng(0)
    return Image.fromarray(rng.integers(0, 255, (32, 128, 3), np.uint8))


class TestAllOps:
    @pytest.mark.parametrize("group", sorted(GROUPS))
    def test_every_op_runs_and_preserves_shape(self, group):
        img = _img()
        rng = np.random.default_rng(1)
        for op in GROUPS[group]:
            for mag in (0, 1, 2):
                out = op(img, mag=mag, rng=rng)
                assert out.size == img.size, f"{type(op).__name__} changed size"
                assert out.mode == img.mode

    def test_ops_actually_modify(self):
        img = _img()
        rng = np.random.default_rng(2)
        unchanged = []
        for group, ops in GROUPS.items():
            for op in ops:
                out = op(img, mag=2, rng=rng)
                if np.array_equal(np.asarray(out), np.asarray(img)):
                    unchanged.append(type(op).__name__)
        assert unchanged == [], f"no-op augmentations: {unchanged}"

    def test_group_inventory_matches_reference(self):
        # dataset.py:269-281 group contents
        names = {g: [type(o).__name__ for o in ops] for g, ops in GROUPS.items()}
        assert names["warp"] == ["Curve", "Distort", "Stretch"]
        assert names["geometry"] == ["Rotate", "Perspective", "Shrink"]
        assert "JpegCompression" in names["camera"]
        assert len(names["process"]) == 7
        assert len(names["blur"]) == 5 and len(names["weather"]) == 5


class TestRandAugment:
    def test_intact_prob_one_is_identity(self):
        aug = RandAugment(intact_prob=1.0)
        img = _img()
        out = aug(img)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(img))

    def test_applies_and_is_deterministic_per_seed(self):
        img = _img()
        a1 = RandAugment(intact_prob=0.0, seed=7)(img)
        a2 = RandAugment(intact_prob=0.0, seed=7)(img)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        assert not np.array_equal(np.asarray(a1), np.asarray(img))

    def test_group_subset(self):
        aug = RandAugment(intact_prob=0.0, groups=["geometry"], num_groups=1, seed=3)
        out = aug(_img())
        assert out.size == (128, 32)


class TestTPSWarp:
    def test_identity_control_points(self):
        from advancedliteratemachinery_tpu.data.augment import _tps_backward_warp
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 256, (16, 20, 3), dtype=np.uint8)
        pts = [[0, 0], [19, 0], [0, 15], [19, 15], [10, 7]]
        out = _tps_backward_warp(arr, pts, pts)
        np.testing.assert_array_equal(out, arr)

    def test_affine_consistent_points_give_exact_affine(self):
        """TPS through affinely-consistent control points degenerates to
        the exact affine map (the RBF weights vanish)."""
        from advancedliteratemachinery_tpu.data.augment import _tps_fit
        rng = np.random.default_rng(1)
        dst = rng.uniform(0, 20, (6, 2))
        A = np.array([[1.1, 0.2], [-0.1, 0.9]])
        b = np.array([2.0, -1.0])
        src = dst @ A.T + b
        w, a = _tps_fit(dst, src)
        assert np.abs(w).max() < 1e-6          # pure affine
        p = np.array([[5.0, 7.0]])
        got = np.concatenate([np.ones((1, 1)), p], 1) @ a
        np.testing.assert_allclose(got, p @ A.T + b, atol=1e-4)

    def test_curve_bends_rows(self):
        """Curve must move pixel mass vertically by different amounts per
        column (the fisheye bend), not uniformly."""
        from advancedliteratemachinery_tpu.data.augment import Curve
        img = Image.fromarray(np.uint8(np.tile(
            np.linspace(0, 255, 64)[:, None], (1, 128))))
        rng = np.random.default_rng(3)
        out = np.asarray(Curve()(img.convert("RGB"), mag=0, rng=rng))
        col_means = out[:, :, 0].mean(axis=0)
        # center columns sample lower (brighter) source rows than edges
        assert abs(float(col_means[64]) - float(col_means[2])) > 5.0


class TestRandAugmentNumpy:
    """RandAugment accepts HWC uint8 numpy (the dataset sample format) and
    is deterministic under a seed — the form engine.batches feeds it."""

    def test_numpy_roundtrip_and_determinism(self):
        from advancedliteratemachinery_tpu.data.augment import RandAugment
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (32, 100, 3), np.uint8)
        a1 = RandAugment(num_groups=2, intact_prob=0.0, seed=7)
        a2 = RandAugment(num_groups=2, intact_prob=0.0, seed=7)
        o1, o2 = a1(img.copy()), a2(img.copy())
        assert isinstance(o1, np.ndarray) and o1.dtype == np.uint8
        assert o1.shape[-1] == 3
        np.testing.assert_array_equal(o1, o2)
        assert not np.array_equal(o1, img)  # something was applied

    def test_intact_prob_one_is_identity(self):
        from advancedliteratemachinery_tpu.data.augment import RandAugment
        img = np.random.default_rng(1).integers(0, 255, (32, 100, 3),
                                                np.uint8)
        out = RandAugment(intact_prob=1.0, seed=0)(img.copy())
        np.testing.assert_array_equal(out, img)

    def test_batches_apply_augment(self):
        from advancedliteratemachinery_tpu.engine import batches as B
        from advancedliteratemachinery_tpu.data.str_dataset import (
            AlignCollate)
        from advancedliteratemachinery_tpu.codecs.char_codec import CharCodec

        class FakeMixer:
            def __init__(self):
                self.rng = np.random.default_rng(0)

            def get_batch(self):
                return [(self.rng.integers(0, 255, (32, 100, 3), np.uint8),
                         "ab") for _ in range(4)]

        from advancedliteratemachinery_tpu.data.augment import RandAugment
        codec = CharCodec(batch_max_length=6)
        plain = next(B.mgp_str_batches(FakeMixer(), codec,
                                       collate=AlignCollate()))
        auged = next(B.mgp_str_batches(
            FakeMixer(), codec, collate=AlignCollate(),
            augment=RandAugment(intact_prob=0.0, seed=3)))
        assert plain["images"].shape == auged["images"].shape
        assert not np.array_equal(plain["images"], auged["images"])
