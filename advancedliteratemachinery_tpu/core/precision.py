"""Dtype policy.

TPU-first precision: parameters in float32, compute in bfloat16, outputs
(logits / losses) in float32. Replaces the reference's mix of
torch.cuda.amp GradScaler (OmniParser engine/train.py:8), apex O2
(VLPT-STD main.py:114) and Lightning precision=16 (GeoLayoutLM train.py:31):
bf16 on TPU needs no loss scaling.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    output_dtype: Any = jnp.float32
    # Inference-only fast path: skip the max-subtraction pass inside fused
    # attention softmax (exp overflows f32 only past logit ~88, which
    # trained encoders never approach). Training keeps the safe default.
    unsafe_softmax: bool = False

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_output(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.output_dtype)
            if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)


def gelu(x):
    """Dtype-aware GELU.

    torch nn.GELU (the reference) is the exact erf form, which matters for
    fp32 checkpoint-parity checks. In bf16 the exact-vs-tanh deviation
    (~1e-3) is below bf16 rounding (eps ≈ 7.8e-3), while exact erf costs
    ~1.7x on the VPU — so bf16 compute uses the tanh approximation.
    """
    import flax.linen as nn

    approx = x.dtype == jnp.bfloat16
    return nn.gelu(x, approximate=approx)
