"""ConvNeXt backbone (tiny), NHWC.

Behavioral parity target: GeoLayoutLM's vendored ConvNeXt
(reference DocumentUnderstanding/GeoLayoutLM/bros/convnext.py —
convnext_tiny: depths (3,3,9,3), dims (96,192,384,768); block = 7x7
depthwise conv → LN → 4x pointwise → GELU → pointwise → layerscale)."""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import gelu as _gelu, Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.models.layers import DropPath


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layerscale_value: float = 1e-6
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = self.policy
        h = nn.Conv(self.dim, (7, 7), padding="SAME", feature_group_count=self.dim,
                    dtype=p.compute_dtype, param_dtype=p.param_dtype,
                    name="dwconv")(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=p.param_dtype, name="norm")(h)
        h = h.astype(p.compute_dtype)
        h = nn.Dense(4 * self.dim, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="pwconv1")(h)
        h = _gelu(h)
        h = nn.Dense(self.dim, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                     name="pwconv2")(h)
        gamma = self.param("gamma", nn.initializers.constant(self.layerscale_value),
                           (self.dim,), p.param_dtype)
        h = h * gamma.astype(h.dtype)
        return x + DropPath(self.drop_path, name="dp")(h, deterministic)


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig(ConfigBase):
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0


class ConvNeXt(nn.Module):
    config: ConvNeXtConfig = ConvNeXtConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[jnp.ndarray]:
        """x [B,H,W,3] → 4 stage maps at strides 4/8/16/32."""
        cfg = self.config
        p = self.policy
        dp = np.linspace(0, cfg.drop_path_rate, sum(cfg.depths))
        x = nn.Conv(cfg.dims[0], (4, 4), (4, 4), padding="VALID",
                    dtype=p.compute_dtype, param_dtype=p.param_dtype,
                    name="stem")(x.astype(p.compute_dtype))
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="stem_norm")(x).astype(p.compute_dtype)
        feats = []
        di = 0
        for s, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
            if s > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                 param_dtype=p.param_dtype,
                                 name=f"ds_norm{s}")(x).astype(p.compute_dtype)
                x = nn.Conv(dim, (2, 2), (2, 2), padding="VALID",
                            dtype=p.compute_dtype, param_dtype=p.param_dtype,
                            name=f"ds_conv{s}")(x)
            for b in range(depth):
                x = ConvNeXtBlock(dim, float(dp[di]), policy=p,
                                  name=f"stage{s}_block{b}")(x, deterministic)
                di += 1
            feats.append(x)
        return feats
