"""Golden-fixture replay: committed checkpoint artifacts must reproduce
their committed outputs through the real user path.

For each priority family, tests/golden/{family}.pth (a DDP-shaped torch
artifact) is loaded with load_torch_state_dict, mapped by the family
importer, and run through flax inference; outputs must match the committed
.npz within the family's import-parity tolerance. Unlike the per-family
import tests (which rebuild their torch mirror inside the test process),
this pins the whole chain against artifacts that do not move with the
code — checkpoint-format drift, importer regressions, and model numerics
changes all fail here. Fixtures: scripts/make_golden_fixtures.py.
"""

import os

import numpy as np
import pytest

import golden_common as G


@pytest.mark.parametrize("family", G.FAMILIES)
def test_golden_replay(family):
    pth = os.path.join(G.GOLDEN_DIR, f"{family}.pth")
    npz = os.path.join(G.GOLDEN_DIR, f"{family}.npz")
    if not (os.path.exists(pth) and os.path.exists(npz)):
        pytest.skip("golden fixtures not generated "
                    "(scripts/make_golden_fixtures.py)")
    from advancedliteratemachinery_tpu.engine.checkpoint import (
        load_torch_state_dict,
    )

    data = np.load(npz)
    inputs = {k[3:]: data[k] for k in data.files if k.startswith("in_")}
    expected = {k[4:]: data[k] for k in data.files if k.startswith("out_")}
    assert expected, "fixture has no expected outputs"

    sd = load_torch_state_dict(pth)
    assert not any(k.startswith("module.") for k in sd)   # DDP stripped
    got = G.RUNNERS[family](sd, inputs)
    rtol, atol = G.TOLERANCES[family]
    for k, want in expected.items():
        g = got[k][..., : want.shape[-1]]    # padded-vocab heads: slice
        np.testing.assert_allclose(g, want, rtol=rtol, atol=atol,
                                   err_msg=f"{family}/{k} diverged from "
                                           f"the committed golden output")
