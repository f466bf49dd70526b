import os
import subprocess

import numpy as np
import pytest

from advancedliteratemachinery_tpu.models.levocr import PAD, UNK, LevtDictionary
from advancedliteratemachinery_tpu.ops.levenshtein import (
    ins_del_targets,
    ins_del_targets_native,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_native():
    so = os.path.join(REPO, "native", "liblevenshtein.so")
    if not os.path.exists(so):
        subprocess.run(["sh", os.path.join(REPO, "native", "build.sh")],
                       check=True, capture_output=True)
    # reset the lazy loader in case an earlier test cached "missing"
    import advancedliteratemachinery_tpu.ops.levenshtein as L

    L._NATIVE_TRIED = False
    L._NATIVE_LIB = None


class TestNativeLevenshtein:
    def test_matches_python_oracle(self):
        import string

        d = LevtDictionary(max_len=20)
        rng = np.random.default_rng(1)
        mk = lambda n: ["".join(rng.choice(list(string.ascii_lowercase),
                                           rng.integers(1, 16))) for _ in range(n)]
        out_t = d.encode(mk(64))
        in_t = d.encode(mk(64))
        py = ins_del_targets(in_t, out_t, PAD, UNK)
        nat = ins_del_targets_native(in_t, out_t, PAD, UNK)
        assert nat is not None
        for a, b in zip(py, nat):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_edge_cases(self):
        d = LevtDictionary("abc", max_len=8)
        for pair in [("", "abc"), ("abc", ""), ("abc", "abc"), ("a", "cba")]:
            in_t = d.encode([pair[0]])
            out_t = d.encode([pair[1]])
            py = ins_del_targets(in_t, out_t, PAD, UNK)
            nat = ins_del_targets_native(in_t, out_t, PAD, UNK)
            for a, b in zip(py, nat):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
