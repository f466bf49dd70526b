"""Generate the committed golden parity fixtures under tests/golden/.

Writes, per model family, a realistic torch checkpoint artifact
({"model": {"module."-prefixed state dict}} — the DDP rank-0 save shape the
reference produces, e.g. OCR/MGP-STR/train_final_dist.py:228) and an .npz
of input arrays + expected outputs, which tests/test_golden.py replays
through the real user path (load_torch_state_dict → importer → flax
inference).

Run from the repo root:  python scripts/make_golden_fixtures.py
Regenerate only when a mirror or fixture schema intentionally changes —
the point of the fixtures is that they do NOT move with the code.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[0:0] = [REPO, os.path.join(REPO, "tests")]

import jax  # noqa: E402

# fixtures must be generated in the environment the suite replays them in:
# CPU backend, full-precision matmuls (tests/conftest.py settings)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import torch  # noqa: E402

import golden_common as G  # noqa: E402


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="comma-separated family subset (default: all); "
                         "use when adding families so committed artifacts "
                         "stay byte-identical")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    from advancedliteratemachinery_tpu.engine.checkpoint import (
        load_torch_state_dict,
    )

    os.makedirs(G.GOLDEN_DIR, exist_ok=True)
    for fam in G.FAMILIES:
        if only is not None and fam not in only:
            continue
        sd, inputs, expected, src = G.build(fam)
        pth = os.path.join(G.GOLDEN_DIR, f"{fam}.pth")
        wrapped = {"model": {"module." + k: torch.as_tensor(v)
                             for k, v in sd.items()}}
        torch.save(wrapped, pth)
        npz = os.path.join(G.GOLDEN_DIR, f"{fam}.npz")
        payload = {f"in_{k}": v for k, v in inputs.items()}
        payload.update({f"out_{k}": v for k, v in expected.items()})
        payload["expected_source"] = np.asarray(src)
        np.savez_compressed(npz, **payload)

        # self-check: the committed artifact replays through the real path
        got = G.RUNNERS[fam](load_torch_state_dict(pth), inputs)
        rtol, atol = G.TOLERANCES[fam]
        for k, want in expected.items():
            g = got[k][..., : want.shape[-1]]
            np.testing.assert_allclose(g, want, rtol=rtol, atol=atol,
                                       err_msg=f"{fam}/{k}")
        kb = (os.path.getsize(pth) + os.path.getsize(npz)) / 1024
        print(f"{fam}: ok ({src} expected, {kb:.0f} KiB)")


if __name__ == "__main__":
    main()
