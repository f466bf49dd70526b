"""Preemption-safe checkpointing + multi-host correctness units.

The reference is fail-stop with manual restart (SURVEY §5: "no
torchelastic, no heartbeats ... design ckpt layer for preemption") and its
multi-machine story is detectron2 launch + rank guards
(VGT/train_VGT.py:156-159). These tests cover what the TPU framework adds:

- atomic checkpoint slots (kill at ANY point never loses a restorable
  state — subprocess SIGKILL fuzz over the save loop);
- keep-last-N step GC;
- SIGTERM → save-and-stop inside fit();
- the pod batch-slicing math against faked process topologies.
"""

import os
import signal
import subprocess
import sys
import textwrap
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from advancedliteratemachinery_tpu.engine.fit import (
    FitConfig,
    fit,
    gc_checkpoints,
    latest_checkpoint_step,
    restore_train_state,
    save_train_state,
)
from advancedliteratemachinery_tpu.engine.train import TrainState
from advancedliteratemachinery_tpu.parallel import multihost
from advancedliteratemachinery_tpu.parallel.mesh import create_mesh


def _tiny_state(value=0.0):
    params = {"w": jnp.full((4,), value, jnp.float32)}
    return TrainState.create(params, optax.sgd(0.1))


class TestAtomicSlots:
    def test_named_slot_survives_rename_window(self, tmp_path):
        """Restore falls back to `{name}.old` when only the first rename
        of the swap completed before a crash."""
        d = str(tmp_path)
        state0 = _tiny_state(1.0)
        save_train_state(d, state0, 0, name="best")

        # simulate the crash window: a newer save moved best -> best.old
        # and died before renaming best.new into place
        os.rename(os.path.join(d, "best"), os.path.join(d, "best.old"))
        got = restore_train_state(os.path.join(d, "best"), _tiny_state())
        np.testing.assert_allclose(np.asarray(got.params["w"]), 1.0)

    def test_named_slot_overwrite_keeps_old_until_new_committed(self, tmp_path):
        d = str(tmp_path)
        save_train_state(d, _tiny_state(1.0), 0, name="best")
        save_train_state(d, _tiny_state(2.0), 1, name="best")
        got = restore_train_state(os.path.join(d, "best"), _tiny_state())
        np.testing.assert_allclose(np.asarray(got.params["w"]), 2.0)
        assert not os.path.exists(os.path.join(d, "best.old"))
        assert not os.path.exists(os.path.join(d, "best.new"))

    def test_stale_new_dir_from_crashed_save_is_replaced(self, tmp_path):
        d = str(tmp_path)
        os.makedirs(os.path.join(d, "best.new"))  # crashed previous save
        save_train_state(d, _tiny_state(3.0), 0, name="best")
        got = restore_train_state(os.path.join(d, "best"), _tiny_state())
        np.testing.assert_allclose(np.asarray(got.params["w"]), 3.0)

    def test_non_primary_process_performs_no_slot_renames(self, tmp_path):
        d = str(tmp_path)
        save_train_state(d, _tiny_state(1.0), 0, name="best")
        # a non-zero process saves arrays but must not touch the slot dirs
        save_train_state(d, _tiny_state(9.0), 1, name="best",
                         process_index=1, process_count=2)
        got = restore_train_state(os.path.join(d, "best"), _tiny_state())
        np.testing.assert_allclose(np.asarray(got.params["w"]), 1.0)


class TestKillDuringSave:
    def test_sigkill_fuzz_always_leaves_restorable_latest(self, tmp_path):
        """A child process saves step checkpoints in a tight loop; the
        parent SIGKILLs it at random times. Whatever step_N dirs survive
        must ALL restore cleanly (Orbax tmp+rename atomicity + the
        step-regex filter on tmp names)."""
        script = textwrap.dedent("""
            import sys
            import jax, jax.numpy as jnp, optax
            jax.config.update("jax_platforms", "cpu")
            from advancedliteratemachinery_tpu.engine.fit import save_train_state
            from advancedliteratemachinery_tpu.engine.train import TrainState
            d = sys.argv[1]
            params = {"w": jnp.zeros((64, 64), jnp.float32)}
            state = TrainState.create(params, optax.sgd(0.1))
            print("ready", flush=True)
            for step in range(200):
                state = state.replace(
                    params={"w": jnp.full((64, 64), float(step))})
                save_train_state(d, state, step)
                save_train_state(d, state, step, name="best")
        """)
        d = str(tmp_path / "ckpt")
        os.makedirs(d)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        rng = np.random.default_rng(0)
        for trial in range(2):
            proc = subprocess.Popen(
                [sys.executable, "-c", script, d],
                stdout=subprocess.PIPE, env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
            assert proc.stdout.readline().strip() == b"ready"
            time.sleep(float(rng.uniform(0.3, 1.2)))
            proc.kill()
            proc.wait()

            latest = latest_checkpoint_step(d)
            if latest is None:
                continue  # killed before the first commit — nothing to lose
            got = restore_train_state(os.path.join(d, f"step_{latest}"),
                                      _tiny_state_64())
            np.testing.assert_allclose(np.asarray(got.params["w"]),
                                       float(latest))
            # the best slot, when present, is also consistent
            best_path = os.path.join(d, "best")
            if os.path.exists(best_path) or os.path.exists(best_path + ".old"):
                got = restore_train_state(best_path, _tiny_state_64())
                w = np.asarray(got.params["w"])
                assert (w == w.ravel()[0]).all()  # a whole committed state


def _tiny_state_64():
    params = {"w": jnp.zeros((64, 64), jnp.float32)}
    return TrainState.create(params, optax.sgd(0.1))


class TestGC:
    def test_keep_last_n(self, tmp_path):
        d = str(tmp_path)
        for step in (1, 2, 3, 4, 5):
            save_train_state(d, _tiny_state(float(step)), step)
        save_train_state(d, _tiny_state(0.0), 5, name="best")
        gc_checkpoints(d, keep_last=2)
        kept = sorted(p for p in os.listdir(d) if p.startswith("step_"))
        assert kept == ["step_4", "step_5"]
        assert os.path.exists(os.path.join(d, "best"))  # slots untouched

    def test_keep_last_zero_keeps_all(self, tmp_path):
        d = str(tmp_path)
        for step in (1, 2):
            save_train_state(d, _tiny_state(), step)
        gc_checkpoints(d, keep_last=0)
        assert latest_checkpoint_step(d) == 2
        assert os.path.exists(os.path.join(d, "step_1"))

    def test_non_primary_does_not_gc(self, tmp_path):
        d = str(tmp_path)
        for step in (1, 2, 3):
            save_train_state(d, _tiny_state(), step)
        gc_checkpoints(d, keep_last=1, process_index=1)
        assert os.path.exists(os.path.join(d, "step_1"))


class TestSigtermInFit:
    def test_sigterm_saves_and_stops(self, tmp_path):
        def loss_fn(params, batch, rng):
            loss = jnp.mean((params["w"] - batch["y"]) ** 2)
            return loss, {"loss": loss}

        def batches():
            k = 0
            while True:
                k += 1
                if k == 3:  # deliver the preemption mid-run
                    os.kill(os.getpid(), signal.SIGTERM)
                yield {"y": np.full((4,), 1.0, np.float32)}

        cfg = FitConfig(total_steps=100, log_interval=1000,
                        ckpt_dir=str(tmp_path / "ckpt"), prefetch=0)
        res = fit(loss_fn, optax.sgd(0.1), {"w": jnp.zeros((4,))},
                  batches(), cfg,
                  mesh=create_mesh(data=1, devices=jax.devices()[:1]),
                  log_fn=lambda m: None)
        assert res.steps_run < 100
        latest = latest_checkpoint_step(str(tmp_path / "ckpt"))
        assert latest == res.steps_run
        # handler restored
        assert signal.getsignal(signal.SIGTERM) in (
            signal.SIG_DFL, signal.default_int_handler)


class TestMultihostMath:
    def test_local_rows_partition_the_batch(self):
        # every process topology tiles the global batch exactly once
        for pcount in (1, 2, 4, 8):
            rows = [multihost.local_batch_rows(32, p, pcount)
                    for p in range(pcount)]
            seen = []
            for r in rows:
                seen.extend(range(r.start, r.stop))
            assert seen == list(range(32))

    def test_indivisible_batch_raises(self):
        with pytest.raises(ValueError, match="not divisible"):
            multihost.local_batch_rows(10, 0, 4)

    def test_slice_host_batch_fakes_topology(self):
        batch = {"x": np.arange(16).reshape(8, 2), "y": np.arange(8)}
        got = multihost.slice_host_batch(batch, pidx=1, pcount=4)
        np.testing.assert_array_equal(got["y"], [2, 3])
        np.testing.assert_array_equal(got["x"], [[4, 5], [6, 7]])

    def test_slice_mismatched_leading_dims_raise(self):
        with pytest.raises(ValueError, match="disagree"):
            multihost.slice_host_batch(
                {"x": np.zeros((8, 2)), "y": np.zeros((4,))}, 0, 2)

    def test_put_host_batch_single_process_matches_device_put(self):
        mesh = create_mesh()  # 8 virtual CPU devices
        from advancedliteratemachinery_tpu.parallel.mesh import batch_sharding
        sh = batch_sharding(mesh)
        batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
        out = multihost.put_host_batch(batch, sh)
        assert out["x"].sharding == sh
        np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])

    def test_put_host_batch_none_sharding_passthrough(self):
        batch = {"x": np.zeros((4,))}
        assert multihost.put_host_batch(batch, None) is batch
