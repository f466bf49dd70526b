"""Pipeline parallelism (GPipe-style microbatching) over a ``pipe`` mesh axis.

The reference has no pipeline parallelism anywhere (SURVEY §2.3 — its
distributed story is DDP/ZeRO); this module exists for the TPU scale-out
path of the deep uniform-layer stacks (TRCG's 32-layer vicuna-7B trunk,
reference AIGC/SceneVTG/TRCG) where a v5e pod slice wants model layers
split across ICI neighbours rather than replicated.

TPU-first design (the scaling-book pipelining recipe, expressed in JAX):

- The layer stack's params are stacked on a leading axis and sharded
  ``P('pipe')``; each device owns one contiguous *stage* of layers.
- Inside one ``shard_map``, a ``lax.scan`` runs ``M + S - 1`` ticks.
  Each tick every stage applies its layers to its current activation and
  hands the result to its ICI neighbour with a single ring
  ``lax.ppermute`` — the classic GPipe schedule with a bubble fraction
  ``(S-1)/(M+S-1)`` (keep ``M >= 4*S`` in production).
- The backward pipeline needs no code: ``jax.grad`` through
  ``scan`` + ``ppermute`` reverses the ring (AD of a permute is the
  inverse permute), yielding the mirrored bubble schedule.
- Per-tick activations are rematerialised in the backward pass
  (``jax.checkpoint`` around the stage body) so the stash is one
  activation per in-flight microbatch, not one per layer.

No torch/NCCL analog exists in the reference to cite; the collective
choreography is standard JAX SPMD (ppermute over a named axis).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # JAX >= 0.4.35 exposes shard_map at the top level
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover - older layout
    from jax.experimental.shard_map import shard_map

from advancedliteratemachinery_tpu.parallel.mesh import AXIS_DATA

AXIS_PIPE = "pipe"


def create_pipeline_mesh(pipe: int, data: int = 1,
                         devices: Optional[Sequence[jax.Device]] = None
                         ) -> Mesh:
    """A (data, pipe) mesh. The pipe axis is innermost so the per-tick
    ppermute hop rides contiguous ICI links on real TPU topologies."""
    devices = list(devices if devices is not None else jax.devices())
    if data * pipe != len(devices):
        raise ValueError(
            f"mesh {data}x{pipe} != {len(devices)} devices")
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh((data, pipe),
                                                  devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(data, pipe)
    return Mesh(dev_array, (AXIS_DATA, AXIS_PIPE))


def stack_layer_params(layer_params: Sequence[Any]):
    """Stack per-layer param pytrees (identical treedefs) on a new leading
    axis: L trees of [...] -> one tree of [L, ...]."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)


def partition_stages(stacked, n_stages: int):
    """[L, ...] stacked layer params -> [S, L/S, ...] stage params."""
    leaves = jax.tree.leaves(stacked)
    if not leaves:
        raise ValueError("empty param tree")
    L = leaves[0].shape[0]
    if L % n_stages:
        raise ValueError(f"{L} layers not divisible into {n_stages} stages")
    return jax.tree.map(
        lambda a: a.reshape((n_stages, L // n_stages) + a.shape[1:]), stacked)


def split_microbatches(batch, n_micro: int):
    """[B, ...] -> [M, B/M, ...] on every leaf."""

    def f(a):
        if a.shape[0] % n_micro:
            raise ValueError(
                f"batch {a.shape[0]} not divisible by {n_micro} microbatches")
        return a.reshape((n_micro, a.shape[0] // n_micro) + a.shape[1:])

    return jax.tree.map(f, batch)


def make_scan_stage(layer_fn: Callable[[Any, Any], Any]
                    ) -> Callable[[Any, Any], Any]:
    """Lift a single-layer fn into a stage fn that scans its [L/S, ...]
    sub-stack: ``layer_fn(one_layer_params, x) -> x``."""

    def stage_fn(stage_params, x):
        def body(h, p):
            return layer_fn(p, h), None

        h, _ = jax.lax.scan(body, x, stage_params)
        return h

    return stage_fn


def gpipe_apply(stage_fn: Callable[[Any, Any], Any], stage_params,
                microbatches, mesh: Mesh, *,
                checkpoint_stage: bool = True):
    """Run the GPipe schedule: ``microbatches`` [M, mb, ...] through S
    pipeline stages whose params are ``stage_params`` [S, ...] sharded
    over the mesh's ``pipe`` axis.

    ``stage_fn(params_for_one_stage, x) -> y`` must preserve the
    activation shape (y.shape == x.shape) so activations chain through
    the ring. Returns [M, mb, ...] outputs, replicated over pipe and
    sharded over ``data`` exactly like the input microbatch dim.

    Differentiable: take ``jax.grad`` of any scalar function of the
    result; the reverse pipeline schedules itself through AD.
    """
    S = mesh.shape[AXIS_PIPE]
    has_data = AXIS_DATA in mesh.shape and mesh.shape[AXIS_DATA] > 1
    mb_spec = P(None, AXIS_DATA) if has_data else P()
    body = jax.checkpoint(stage_fn) if checkpoint_stage else stage_fn

    def per_device(params, mbs):
        # params: [1, ...] local stage slice; mbs: [M, mb_local, ...]
        params = jax.tree.map(lambda a: jnp.squeeze(a, 0), params)
        s = jax.lax.axis_index(AXIS_PIPE)
        M = jax.tree.leaves(mbs)[0].shape[0]
        T = M + S - 1
        recv0 = jax.tree.map(lambda a: jnp.zeros_like(a[0]), mbs)
        outs0 = jax.tree.map(jnp.zeros_like, mbs)

        def tick(carry, t):
            recv, outs = carry
            inp = jax.tree.map(
                lambda a: a[jnp.clip(t, 0, M - 1)], mbs)
            x = jax.tree.map(
                lambda i, r: jnp.where(s == 0, i, r), inp, recv)
            y = body(params, x)
            # Last stage stores finished microbatch t-(S-1). The clip
            # makes ticks t < S-1 write garbage into slot 0, which tick
            # t = S-1 then overwrites with the true value — so the write
            # needs no validity mask. Non-last stages' outs are zeroed
            # before the final psum broadcast.
            out_idx = jnp.clip(t - (S - 1), 0, M - 1)
            outs = jax.tree.map(
                lambda o, v: jax.lax.dynamic_update_index_in_dim(
                    o, v, out_idx, 0), outs, y)
            ring = [(i, (i + 1) % S) for i in range(S)]
            nxt = jax.tree.map(
                lambda a: jax.lax.ppermute(a, AXIS_PIPE, ring), y)
            return (nxt, outs), None

        (_, outs), _ = jax.lax.scan(tick, (recv0, outs0), jnp.arange(T))
        outs = jax.tree.map(
            lambda o: jnp.where(s == S - 1, o, jnp.zeros_like(o)), outs)
        return jax.lax.psum(outs, AXIS_PIPE)

    return shard_map(
        per_device, mesh=mesh,
        in_specs=(P(AXIS_PIPE), mb_spec),
        out_specs=mb_spec,
        check_vma=False,
    )(stage_params, microbatches)
