"""load_params_checkpoint: one inference-side loader for every repo
checkpoint artifact (raw params from `import-ckpt`, fit() train-state
payloads, and whole run dirs with best/step_N resolution) — the
train → infer round trip the reference does with per-project
`--saved_model` conventions (MGP-STR train_final_dist.py:195-228)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.engine.checkpoint import (
    load_params_checkpoint,
    save_checkpoint,
)
from advancedliteratemachinery_tpu.engine.fit import save_train_state
from advancedliteratemachinery_tpu.engine.train import (
    TrainState,
    make_optimizer,
)

pytestmark = pytest.mark.model


@pytest.fixture(scope="module")
def tiny_model_params():
    from advancedliteratemachinery_tpu.models.mgp_str import (
        MGPSTR, MGPSTRConfig)

    model = MGPSTR(MGPSTRConfig(variant="tiny"))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 128, 3)))["params"]
    return model, params


def _leaf(tree):
    return jax.tree.leaves(tree)[0]


class TestLoadParamsCheckpoint:
    def test_raw_params_artifact(self, tmp_path, tiny_model_params):
        model, params = tiny_model_params
        path = str(tmp_path / "imported")
        save_checkpoint(path, params)
        got = load_params_checkpoint(path, jax.tree.map(np.copy, params))
        np.testing.assert_array_equal(_leaf(got), _leaf(params))

    def test_fit_payload_and_run_dir_resolution(self, tmp_path,
                                                tiny_model_params):
        model, params = tiny_model_params
        state = TrainState.create(
            params, make_optimizer(lr=1e-4, total_steps=10))
        run = str(tmp_path / "run")
        save_train_state(run, state, 2)

        # explicit step dir: fit payload → params subtree extracted
        got = load_params_checkpoint(os.path.join(run, "step_2"),
                                     jax.tree.map(np.copy, params))
        np.testing.assert_array_equal(_leaf(got), _leaf(params))

        # run dir without best → newest step_N
        got = load_params_checkpoint(run, jax.tree.map(np.copy, params))
        np.testing.assert_array_equal(_leaf(got), _leaf(params))

        # run dir with best → best wins
        best_state = TrainState.create(
            jax.tree.map(lambda a: a + 1.0, params),
            make_optimizer(lr=1e-4, total_steps=10))
        save_train_state(run, best_state, 2, name="best")
        got = load_params_checkpoint(run, jax.tree.map(np.copy, params))
        np.testing.assert_array_equal(_leaf(got), _leaf(params) + 1.0)

    def test_wrong_variant_is_a_clear_error(self, tmp_path,
                                            tiny_model_params):
        from advancedliteratemachinery_tpu.models.mgp_str import (
            MGPSTR, MGPSTRConfig)

        _, params = tiny_model_params
        state = TrainState.create(
            params, make_optimizer(lr=1e-4, total_steps=10))
        run = str(tmp_path / "run")
        save_train_state(run, state, 1)

        small = MGPSTR(MGPSTRConfig(variant="small"))
        sp = small.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 128, 3)))["params"]
        with pytest.raises(ValueError, match="variant|mismatch|match"):
            load_params_checkpoint(run, sp)

    def test_cli_recognize_loads_a_training_run(self, tmp_path,
                                                tiny_model_params,
                                                monkeypatch, capsys):
        """The user story: `recognize --ckpt <run-dir>` consumes what
        `train --ckpt-dir <run-dir>` wrote."""
        from PIL import Image

        from advancedliteratemachinery_tpu import cli

        _, params = tiny_model_params
        state = TrainState.create(
            params, make_optimizer(lr=1e-4, total_steps=10))
        run = str(tmp_path / "run")
        save_train_state(run, state, 3)

        img = tmp_path / "word.png"
        Image.fromarray(np.random.default_rng(0).integers(
            0, 256, (32, 100, 3), dtype=np.uint8)).save(img)
        rc = cli.main(["recognize", str(img), "--variant", "tiny",
                       "--ckpt", run])
        assert rc == 0
        out = capsys.readouterr().out.strip()
        payload = json.loads(out.splitlines()[-1])
        assert set(payload) == {"image", "text", "confidence", "head"}
