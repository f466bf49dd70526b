import numpy as np
import pytest

from advancedliteratemachinery_tpu.codecs.coords import CoordSeqVocab
from advancedliteratemachinery_tpu.eval.spotting_eval import (
    confidence_ensemble,
    decode_spotting_outputs,
)


class TestDecodeSpotting:
    def test_decode(self):
        v = CoordSeqVocab(num_bins=100, chars="ab")
        a_id = v.num_bins  # 'a'
        outputs = {
            "points": np.asarray([[[50, 25], [0, 0]]]),
            "instance_valid": np.asarray([[True, False]]),
            "polygons": np.asarray([[[10, 10, 90, 10, 90, 40, 10, 40],
                                     [0] * 8]]),
            "rec_tokens": np.asarray([[[a_id, a_id + 1, v.rec_eos_index, 0],
                                       [0] * 4]]),
            "rec_probs": np.asarray([[[0.9, 0.8, 0.99, 0.1], [0] * 4]]),
        }
        res = decode_spotting_outputs(outputs, v, "img1.png", (200, 400))
        assert len(res) == 1  # invalid instance dropped
        r = res[0]
        assert r["pts"][0] == [0.5 * 400, 0.25 * 200]
        assert r["rec"] == "ab"
        assert r["polys"][0] == [0.1 * 400, 0.1 * 200]
        assert 0.8 < r["score"] < 0.9  # geometric mean of (0.9, 0.8)

    def test_char_str_variant(self):
        import jax
        import jax.numpy as jnp

        from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
        from advancedliteratemachinery_tpu.models.mgp_str import MGPSTR, MGPSTRConfig
        from advancedliteratemachinery_tpu.models.vit import ViTConfig

        cfg = MGPSTRConfig(variant="tiny", heads=("char",),
                           vit=ViTConfig(embed_dim=32, depth=1, num_heads=2))
        model = MGPSTR(cfg, policy=FP32_POLICY)
        x = jnp.zeros((1, 32, 128, 3))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        out = model.apply({"params": params}, x)
        assert set(out) == {"char"}
        assert "bpe_head" not in params  # no unused params


class TestEnsemble:
    def test_picks_highest_confidence_run(self):
        preds = [["aa", "bb"], ["ax", "by"]]
        confs = [[0.9, 0.1], [0.2, 0.8]]
        assert confidence_ensemble(preds, confs) == ["aa", "by"]


class TestSpottingFscore:
    def _sq(self, x, y, s=10):
        return [[x, y], [x + s, y], [x + s, y + s], [x, y + s]]

    def test_detection_prf(self):
        from advancedliteratemachinery_tpu.eval.spotting_eval import (
            spotting_fscore,
        )

        gts = {1: [{"polys": self._sq(0, 0), "text": "cat"},
                   {"polys": self._sq(40, 40), "text": "dog"}]}
        preds = {1: [{"polys": self._sq(0, 0), "text": "cat"},
                     {"polys": self._sq(80, 80), "text": "xx"}]}   # FP
        m = spotting_fscore(preds, gts)
        assert m["matched"] == 1 and m["num_det"] == 2 and m["num_gt"] == 2
        assert np.isclose(m["precision"], 0.5)
        assert np.isclose(m["recall"], 0.5)
        assert np.isclose(m["hmean"], 0.5)

    def test_e2e_requires_text_match(self):
        from advancedliteratemachinery_tpu.eval.spotting_eval import (
            spotting_fscore,
        )

        gts = {1: [{"polys": self._sq(0, 0), "text": "cat"}]}
        preds = {1: [{"polys": self._sq(0, 0), "text": "cot"}]}
        assert spotting_fscore(preds, gts)["matched"] == 1        # det ok
        assert spotting_fscore(preds, gts, e2e=True)["matched"] == 0
        preds_ok = {1: [{"polys": self._sq(0, 0), "text": "CAT"}]}
        assert spotting_fscore(preds_ok, gts, e2e=True)["hmean"] == 1.0

    def test_ignore_regions_neither_count_nor_penalize(self):
        from advancedliteratemachinery_tpu.eval.spotting_eval import (
            spotting_fscore,
        )

        gts = {1: [{"polys": self._sq(0, 0), "text": "cat"},
                   {"polys": self._sq(40, 40), "text": "###",
                    "ignore": True}]}
        # detection inside the don't-care region is dropped, not a FP
        preds = {1: [{"polys": self._sq(0, 0), "text": "cat"},
                     {"polys": self._sq(40, 40), "text": "zz"}]}
        m = spotting_fscore(preds, gts)
        assert m["num_gt"] == 1 and m["num_det"] == 1
        assert m["hmean"] == 1.0

    def test_one_to_one_matching(self):
        from advancedliteratemachinery_tpu.eval.spotting_eval import (
            spotting_fscore,
        )

        # two detections on one GT: only one counts, the other is a FP
        gts = {1: [{"polys": self._sq(0, 0)}]}
        preds = {1: [{"polys": self._sq(0, 0)},
                     {"polys": self._sq(1, 1)}]}
        m = spotting_fscore(preds, gts)
        assert m["matched"] == 1 and m["num_det"] == 2
