"""End-to-end training driver: data → sharded step → eval cadence → checkpoints.

This is the user-facing `train` surface. The reference wires this loop by
hand in every project (MGP-STR train_final_dist.py:31-238 —
Batch_Balanced_Dataset mixing, the `while True` iteration loop, valInterval
validation with best-accuracy tracking, checkpoints every 5e3 iters, plain
text `log_train.txt`; LISTER train_dist.py:28; OmniParser main.py:21);
here one `fit()` composes any recipe's (loss_fn, tx) with a batch iterator,
the pjit train step, periodic evaluation, and Orbax save/best/resume.

TPU-first details:
- batches cross host→device as uint8 images (4x smaller than f32) and are
  normalized on device inside the jitted step (ops/image.normalize_crops);
- the step is donated, so the driver only ever holds the live TrainState;
- on multi-device meshes the state lives on the (data, fsdp, model)
  shardings from engine.train.state_shardings — gradient sync is the
  XLA-inserted reduction, not a NCCL allreduce;
- resume restores params/opt_state/step (and batch_stats for BatchNorm
  models) from the newest `step_*` directory, exactly like the reference's
  `--saved_model` + iteration-parsed-from-filename flow
  (train_final_dist.py:127).
"""

from __future__ import annotations

import dataclasses
import os
import re
import time
from typing import Any, Callable, Dict, Iterator, List, Optional

import jax
import numpy as np

from advancedliteratemachinery_tpu.engine.train import (
    TrainState,
    make_train_step,
)
from advancedliteratemachinery_tpu.engine.train_extras import (
    MutableTrainState,
    make_mutable_train_step,
)
from advancedliteratemachinery_tpu.parallel.mesh import batch_sharding, create_mesh
from advancedliteratemachinery_tpu.utils.metrics import MetricLogger, nan_guard

_STEP_DIR = re.compile(r"^step_(\d+)$")


@dataclasses.dataclass
class FitConfig:
    total_steps: int = 10_000
    log_interval: int = 100
    val_interval: int = 0          # 0 = never (reference valInterval)
    save_interval: int = 0         # 0 = final only (reference saves every 5e3)
    ckpt_dir: Optional[str] = None
    resume: bool = False
    seed: int = 0
    best_key: str = "accuracy"     # metric maximized for the `best` ckpt
    profile_dir: Optional[str] = None  # jax.profiler trace output
    profile_steps: int = 5         # steps traced (after a warmup step)
    prefetch: int = 2              # batches kept ahead on a loader thread
    #                                (0 = fetch inline, pre-round-3 behavior)
    keep_last: int = 3             # step_N checkpoints retained (0 = all)
    handle_sigterm: bool = True    # preemption: save + stop on SIGTERM


@dataclasses.dataclass
class FitResult:
    state: Any                     # final TrainState / MutableTrainState
    history: List[Dict[str, float]]  # one entry per validation
    best_metric: Optional[float]
    steps_run: int
    last_metrics: Optional[Dict[str, float]] = None  # last logged step


# ---------------- checkpoint layout ----------------


def latest_checkpoint_step(ckpt_dir: str) -> Optional[int]:
    """Newest `step_N` under ckpt_dir, or None."""
    if not ckpt_dir or not os.path.isdir(ckpt_dir):
        return None
    steps = [int(m.group(1)) for d in os.listdir(ckpt_dir)
             if (m := _STEP_DIR.match(d))]
    return max(steps) if steps else None


def _state_payload(state) -> Dict[str, Any]:
    payload = {"step": state.step, "params": state.params,
               "opt_state": state.opt_state}
    if isinstance(state, MutableTrainState):
        payload["batch_stats"] = state.batch_stats
    return payload


def save_train_state(ckpt_dir: str, state, step: int,
                     name: Optional[str] = None,
                     process_index: Optional[int] = None,
                     process_count: Optional[int] = None) -> str:
    """Save to `{ckpt_dir}/step_{step}` (or `{ckpt_dir}/{name}`).

    Preemption-safe (SURVEY §5 "design ckpt layer for preemption"):

    - Orbax itself writes to a `*.orbax-checkpoint-tmp-*` sibling and
      renames on commit, so a kill mid-write never leaves a half-written
      directory under the final path (`latest_checkpoint_step` ignores the
      tmp names).
    - Named slots (best / preempt) are never rmtree'd before the
      replacement exists: the new payload is committed to `{name}.new`,
      the previous slot is moved to `{name}.old`, the new one renamed in,
      and only then is the old slot deleted. `restore_train_state` falls
      back to `{name}.old` for the one-rename crash window.
    - On pods the Orbax save is collective (all processes call it with the
      live sharded arrays); only process 0 performs the slot renames / GC.
    """
    import shutil

    from advancedliteratemachinery_tpu.parallel import multihost

    import orbax.checkpoint as ocp

    pcount = multihost.process_count(process_count)
    primary = multihost.is_primary(process_index)
    path = os.path.abspath(os.path.join(ckpt_dir, name or f"step_{step}"))

    payload = _state_payload(state)
    if pcount == 1:
        # host copy: decouples the file write from donated device buffers
        payload = jax.device_get(payload)

    target = path if name is None else f"{path}.new"
    if os.path.exists(target) and primary:
        shutil.rmtree(target)  # stale .new from a crashed save
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(target, payload, force=True)

    if name is not None and primary:
        old = f"{path}.old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(target, path)
        if os.path.exists(old):
            shutil.rmtree(old)
    return path


def gc_checkpoints(ckpt_dir: str, keep_last: int,
                   process_index: Optional[int] = None) -> None:
    """Delete all but the newest `keep_last` step_N checkpoints.

    Named slots (best/...) are untouched. keep_last <= 0 keeps everything.
    """
    import shutil

    from advancedliteratemachinery_tpu.parallel import multihost

    if keep_last <= 0 or not multihost.is_primary(process_index):
        return
    if not ckpt_dir or not os.path.isdir(ckpt_dir):
        return
    steps = sorted(int(m.group(1)) for d in os.listdir(ckpt_dir)
                   if (m := _STEP_DIR.match(d)))
    for s in steps[:-keep_last]:
        shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"),
                      ignore_errors=True)


def restore_train_state(path: str, state):
    """Restore a state saved by save_train_state into `state`'s structure.

    Falls back to `{path}.old` when `path` is missing (the rename window
    of a named-slot save interrupted between its two renames)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.exists(path) and os.path.exists(f"{path}.old"):
        path = f"{path}.old"
    target = jax.device_get(_state_payload(state))
    with ocp.StandardCheckpointer() as ckptr:
        got = ckptr.restore(path, target)
    new = state.replace(step=got["step"], params=got["params"],
                        opt_state=got["opt_state"])
    if isinstance(state, MutableTrainState):
        new = new.replace(batch_stats=got["batch_stats"])
    return new


# ---------------- the driver ----------------


def fit(
    loss_fn: Callable,
    tx,
    params,
    batches: Iterator[Dict[str, np.ndarray]],
    cfg: FitConfig,
    *,
    mesh=None,
    batch_stats: Optional[Any] = None,
    eval_fn: Optional[Callable[[Any], Dict[str, float]]] = None,
    log_fn: Callable[[str], None] = print,
) -> FitResult:
    """Run the training loop.

    loss_fn/tx: a recipe pair (engine.recipes). For BatchNorm models pass
    `batch_stats` and a mutable-signature loss_fn
    (params, batch_stats, batch, rng) -> (loss, (metrics, new_stats)).
    batches: infinite iterator of host numpy batch dicts.
    eval_fn(state) -> metrics dict; called every cfg.val_interval steps and
    once at the end; its cfg.best_key entry drives the `best` checkpoint.
    """
    from advancedliteratemachinery_tpu.parallel import multihost

    mesh = mesh or create_mesh()
    primary = multihost.is_primary()
    mutable = batch_stats is not None
    if mutable:
        state = MutableTrainState.create(params, batch_stats, tx)
        step_fn, shardings = make_mutable_train_step(loss_fn, state, mesh)
    else:
        state = TrainState.create(params, tx)
        step_fn, shardings = make_train_step(loss_fn, state, mesh)

    start_step = 0
    if cfg.resume and cfg.ckpt_dir:
        latest = latest_checkpoint_step(cfg.ckpt_dir)
        if latest is not None:
            state = restore_train_state(
                os.path.join(cfg.ckpt_dir, f"step_{latest}"), state)
            start_step = int(jax.device_get(state.step))
            log_fn(f"[fit] resumed from step_{latest} (step={start_step})")

    if mesh.size > 1:
        state = jax.device_put(state, shardings)
        bshard = batch_sharding(mesh)
    else:
        # single-device: plain jit, no NamedShardings (see engine.train
        # note on the axon 1-device sharding pathology)
        bshard = None

    if cfg.prefetch:
        from advancedliteratemachinery_tpu.engine.batches import (
            prefetch_batches)
        batches = prefetch_batches(batches, cfg.prefetch, sharding=bshard)
        bshard = None  # transfers already issued on the loader thread

    log_file = None
    if cfg.ckpt_dir:
        os.makedirs(cfg.ckpt_dir, exist_ok=True)
        if primary:
            # log-file I/O is process-0 only on pods (SURVEY §5: replace
            # is_main_process() patterns with jax.process_index()==0)
            log_file = open(os.path.join(cfg.ckpt_dir, "log_train.txt"), "a")

    def _log(msg: str) -> None:
        if primary:
            log_fn(msg)
        if log_file:
            log_file.write(msg + "\n")
            log_file.flush()

    # Preemption hook: SIGTERM (the TPU-VM/GKE eviction signal) requests a
    # final checkpoint at the next step boundary instead of dying mid-save.
    preempted = {"flag": False}
    prev_sigterm = None
    if cfg.handle_sigterm and cfg.ckpt_dir:
        import signal

        def _on_sigterm(signum, frame):
            preempted["flag"] = True

        try:
            prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not the main thread (e.g. test harness)
            prev_sigterm = None

    logger = MetricLogger(print_fn=_log)
    history: List[Dict[str, float]] = []
    best: Optional[float] = None
    rng = jax.random.PRNGKey(cfg.seed)

    def _run_eval(step_no: int) -> None:
        nonlocal best
        if eval_fn is None:
            return
        metrics = eval_fn(state)
        history.append({"step": float(step_no), **metrics})
        _log(f"[fit] step {step_no} val: " + "  ".join(
            f"{k}={v:.4f}" for k, v in metrics.items()))
        score = metrics.get(cfg.best_key)
        if score is not None and (best is None or score > best) and cfg.ckpt_dir:
            best = score
            save_train_state(cfg.ckpt_dir, state, step_no, name="best")
            _log(f"[fit] step {step_no}: new best {cfg.best_key}={score:.4f}")

    t0 = time.time()
    step_no = start_step
    last_metrics: Optional[Dict[str, float]] = None
    try:
        profiling = False
        for step_no in range(start_step + 1, cfg.total_steps + 1):
            if cfg.profile_dir and step_no == start_step + 2:
                # skip the compile step, then trace profile_steps steps
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True
                _log(f"[fit] tracing steps {step_no}.."
                     f"{step_no + cfg.profile_steps - 1} → "
                     f"{cfg.profile_dir}")
            batch = next(batches)
            if bshard is not None:
                batch = multihost.put_host_batch(batch, bshard)
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub)
            if profiling and step_no >= start_step + 1 + cfg.profile_steps:
                jax.tree.map(
                    lambda a: a.block_until_ready()
                    if hasattr(a, "block_until_ready") else a, metrics)
                jax.profiler.stop_trace()
                profiling = False

            if step_no % cfg.log_interval == 0 or step_no == cfg.total_steps:
                host = {k: float(v) for k, v in
                        jax.device_get(metrics).items()}
                last_metrics = host
                nan_guard(host.get("loss", 0.0), step_no)
                dt = time.time() - t0
                logger.update(**host)
                _log(f"[fit] step {step_no}/{cfg.total_steps} "
                     f"({dt:.1f}s)  {logger}")
            if cfg.val_interval and step_no % cfg.val_interval == 0:
                _run_eval(step_no)
            if (cfg.save_interval and cfg.ckpt_dir
                    and step_no % cfg.save_interval == 0):
                save_train_state(cfg.ckpt_dir, state, step_no)
                gc_checkpoints(cfg.ckpt_dir, cfg.keep_last)
            if preempted["flag"]:
                save_train_state(cfg.ckpt_dir, state, step_no)
                _log(f"[fit] SIGTERM: saved step_{step_no}, stopping")
                break

        if not preempted["flag"]:
            if cfg.val_interval == 0 or step_no % cfg.val_interval != 0:
                _run_eval(step_no)
            if cfg.ckpt_dir and (cfg.save_interval == 0
                                 or step_no % cfg.save_interval != 0):
                save_train_state(cfg.ckpt_dir, state, step_no)
                gc_checkpoints(cfg.ckpt_dir, cfg.keep_last)
    finally:
        if cfg.profile_dir and profiling:
            jax.profiler.stop_trace()
        if log_file:
            log_file.close()
        if prev_sigterm is not None:
            import signal

            signal.signal(signal.SIGTERM, prev_sigterm)

    return FitResult(state=state, history=history, best_metric=best,
                     steps_run=step_no - start_step,
                     last_metrics=last_metrics)
