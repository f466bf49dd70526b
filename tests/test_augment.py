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
