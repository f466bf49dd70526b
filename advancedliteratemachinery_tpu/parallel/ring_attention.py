"""Sequence parallelism: ring attention over a ``seq`` mesh axis.

The reference has no sequence parallelism anywhere (SURVEY §5 "long
context" — its longest sequences are TRCG's LLaVA ``model_max_length
2048``, handled by flash-attn kernels on one GPU). On TPU the scale-out
story for long context is the ring: shard the sequence across devices,
keep Q resident, and rotate K/V blocks around the ICI ring with one
``ppermute`` per step while accumulating attention with the
flash/online-softmax recurrence — compute on the current block overlaps
the DMA of the next, and no device ever materialises the full [S, S]
score matrix (memory per device is O(S/N · S/N) per step).

Differentiable: ``jax.grad`` through the scan + ppermute yields the
reverse ring (AD of a permute is the inverse permute) — the standard
ring-attention backward — with the per-step recompute coming from
``jax.checkpoint`` around the block body.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # JAX >= 0.4.35 exposes shard_map at the top level
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover - older layout
    from jax.experimental.shard_map import shard_map

from advancedliteratemachinery_tpu.parallel.mesh import AXIS_DATA

AXIS_SEQ = "seq"

_NEG = -0.5 * jnp.finfo(jnp.float32).max


def create_seq_mesh(seq: int, data: int = 1,
                    devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A (data, seq) mesh; seq innermost so the K/V rotation rides
    contiguous ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    if data * seq != len(devices):
        raise ValueError(f"mesh {data}x{seq} != {len(devices)} devices")
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh((data, seq),
                                                  devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(data, seq)
    return Mesh(dev_array, (AXIS_DATA, AXIS_SEQ))


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, *, causal: bool = False,
                   scale: Optional[float] = None) -> jnp.ndarray:
    """Exact attention over sequence-sharded q/k/v [B, S, H, hd].

    S is sharded over the mesh's ``seq`` axis (and B over ``data`` when
    that axis has size > 1); the result has the same sharding as ``q``.
    fp32 online-softmax accumulation regardless of input dtype; output in
    the input dtype.
    """
    S_dev = mesh.shape[AXIS_SEQ]
    if scale is None:
        scale = q.shape[-1] ** -0.5
    has_data = AXIS_DATA in mesh.shape and mesh.shape[AXIS_DATA] > 1
    spec = P(AXIS_DATA if has_data else None, AXIS_SEQ)
    ring = [(i, (i + 1) % S_dev) for i in range(S_dev)]

    def per_device(q, k, v):
        # q/k/v: [B, C, H, hd] local chunks; device i starts holding
        # K/V chunk i and after t rotations holds chunk (i - t) mod S.
        me = jax.lax.axis_index(AXIS_SEQ)
        C = q.shape[1]
        qs = (q.astype(jnp.float32)) * scale
        q_pos = me * C + jnp.arange(C)                      # global q rows

        def block(carry, t):
            o, m, l, kk, vv = carry
            src = jax.lax.rem(me - t + S_dev, S_dev)
            s = jnp.einsum("bqhd,bkhd->bqhk", qs, kk.astype(jnp.float32))
            if causal:
                k_pos = src * C + jnp.arange(C)
                mask = (q_pos[:, None] >= k_pos[None, :])   # [C, Ck]
                maskf = mask[None, :, None, :]
                s = jnp.where(maskf, s, _NEG)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            p = jnp.exp(s - m_new[..., None])
            if causal:
                p = p * maskf                                # kill -inf rows
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1)
            o = o * corr[..., None] + jnp.einsum(
                "bqhk,bkhd->bqhd", p, vv.astype(jnp.float32))
            kk, vv = jax.tree.map(
                lambda a: jax.lax.ppermute(a, AXIS_SEQ, ring), (kk, vv))
            return (o, m_new, l, kk, vv), None

        B, _, H, hd = q.shape
        o0 = jnp.zeros((B, C, H, hd), jnp.float32)
        m0 = jnp.full((B, C, H), _NEG, jnp.float32)
        l0 = jnp.zeros((B, C, H), jnp.float32)
        (o, _, l, _, _), _ = jax.lax.scan(
            jax.checkpoint(block), (o0, m0, l0, k, v),
            jnp.arange(S_dev))
        return (o / jnp.maximum(l[..., None], 1e-30)).astype(q.dtype)

    return shard_map(
        per_device, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v)
