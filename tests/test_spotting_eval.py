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
