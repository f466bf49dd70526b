"""DLA (Deep Layer Aggregation) backbone with deformable upsampling.

Behavioral parity target: LORE-TSR's pose_dla_dcn
(reference: DocumentUnderstanding/LORE-TSR/src/lib/models/networks/
pose_dla_dcn.py — BasicBlock :31, Root :147, Tree :168, DLA :224,
dla34 :310 [levels 1,1,1,2,2,1; channels 16,32,64,128,256,512],
DeformConv :345, IDAUp :361, DLAUp :390, DLASeg :428).

TPU-first notes: NHWC; BatchNorm carries running stats in a `batch_stats`
collection; the transposed-conv upsample is initialized to (and kept as)
bilinear weights like the reference's fill_up_weights; the deformable convs
use the XLA gather + MXU matmul op from ops/deform_conv.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.ops.deform_conv import DeformConv2d

BN_MOMENTUM = 0.9  # flax momentum = 1 - torch momentum (torch 0.1)


class ConvBnRelu(nn.Module):
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: int = 1
    relu: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.policy
        x = nn.Conv(self.features, self.kernel_size, self.strides,
                    padding=[(d * (k // 2), d * (k // 2)) for k, d in
                             zip(self.kernel_size, (self.dilation, self.dilation))],
                    kernel_dilation=(self.dilation, self.dilation), use_bias=False,
                    dtype=p.compute_dtype, param_dtype=p.param_dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=jnp.float32, param_dtype=p.param_dtype, name="bn")(x)
        return nn.relu(x).astype(p.compute_dtype) if self.relu else x.astype(p.compute_dtype)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        out = ConvBnRelu(self.planes, (3, 3), (self.stride, self.stride),
                         self.dilation, policy=self.policy, name="conv1")(x, train)
        out = ConvBnRelu(self.planes, (3, 3), (1, 1), self.dilation, relu=False,
                         policy=self.policy, name="conv2")(out, train)
        return nn.relu(out + residual)


class Root(nn.Module):
    features: int
    residual: bool
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, *children, train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = ConvBnRelu(self.features, (1, 1), relu=False, policy=self.policy,
                       name="conv")(x, train)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    levels: int
    in_channels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_residual: bool = False
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, residual=None, children=None, train: bool = False):
        root_dim = self.root_dim or 2 * self.out_channels
        if self.level_root:
            root_dim += self.in_channels
        children = list(children) if children else []

        if self.stride > 1:
            bottom = nn.max_pool(x, (self.stride, self.stride),
                                 (self.stride, self.stride))
        else:
            bottom = x
        if self.in_channels != self.out_channels:
            project = ConvBnRelu(self.out_channels, (1, 1), relu=False,
                                 policy=self.policy, name="project")(bottom, train)
        else:
            project = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = BasicBlock(self.out_channels, self.stride, policy=self.policy,
                            name="tree1")(x, residual=project, train=train)
            x2 = BasicBlock(self.out_channels, 1, policy=self.policy,
                            name="tree2")(x1, train=train)
            return Root(self.out_channels, self.root_residual, policy=self.policy,
                        name="root")(x2, x1, *children, train=train)
        x1 = Tree(self.levels - 1, self.in_channels, self.out_channels, self.stride,
                  root_residual=self.root_residual, policy=self.policy,
                  name="tree1")(x, residual=project, train=train)
        children.append(x1)
        return Tree(self.levels - 1, self.out_channels, self.out_channels, 1,
                    root_dim=root_dim + self.out_channels,
                    root_residual=self.root_residual, policy=self.policy,
                    name="tree2")(x1, children=children, train=train)


@dataclasses.dataclass(frozen=True)
class DLAConfig(ConfigBase):
    levels: Tuple[int, ...] = (1, 1, 1, 2, 2, 1)
    channels: Tuple[int, ...] = (16, 32, 64, 128, 256, 512)
    in_chans: int = 3


class DLA(nn.Module):
    """dla34 trunk: 6 pyramid levels, strides 1..32 (pose_dla_dcn.py:224)."""

    config: DLAConfig = DLAConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        ch = cfg.channels
        x = ConvBnRelu(ch[0], (7, 7), policy=self.policy, name="base_layer")(x, train)
        y = []
        # level0: one conv block; level1: conv stride 2
        x = ConvBnRelu(ch[0], (3, 3), policy=self.policy, name="level0")(x, train)
        y.append(x)
        x = ConvBnRelu(ch[1], (3, 3), (2, 2), policy=self.policy, name="level1")(x, train)
        y.append(x)
        x = Tree(cfg.levels[2], ch[1], ch[2], 2, level_root=False,
                 policy=self.policy, name="level2")(x, train=train)
        y.append(x)
        x = Tree(cfg.levels[3], ch[2], ch[3], 2, level_root=True,
                 policy=self.policy, name="level3")(x, train=train)
        y.append(x)
        x = Tree(cfg.levels[4], ch[3], ch[4], 2, level_root=True,
                 policy=self.policy, name="level4")(x, train=train)
        y.append(x)
        x = Tree(cfg.levels[5], ch[4], ch[5], 2, level_root=True,
                 policy=self.policy, name="level5")(x, train=train)
        y.append(x)
        return y


def _bilinear_upsample_kernel(f: int) -> np.ndarray:
    """fill_up_weights (pose_dla_dcn.py:334): bilinear kernel [2f, 2f]."""
    k = f * 2
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    w = np.zeros((k, k), np.float32)
    for i in range(k):
        for j in range(k):
            w[i, j] = (1 - abs(i / f - c)) * (1 - abs(j / f - c))
    return w


class UpsampleBilinear(nn.Module):
    """Depthwise transposed conv, bilinear-initialized and trainable like the
    reference's ConvTranspose2d(o, o, 2f, stride=f, padding=f//2, groups=o)
    after fill_up_weights (pose_dla_dcn.py:372). Kernel layout [2f, 2f, C]
    (one spatial kernel per channel, groups == channels).

    Two exact formulations of the same parameters:
    - shuffle=True (default): phase decomposition — each of the f² output
      phases is a depthwise 2x2-tap conv of the LOW-res input with a
      strided slice of the kernel, interleaved by pixel shuffle. No
      lhs-dilated conv (which lowers poorly on TPU — the same chain was
      2/3 of the DB detector's time before its pixel-shuffle rewrite).
    - shuffle=False: the literal lhs-dilated conv (kernel rotated 180°,
      padding k-1-f//2), kept as the reference-shaped oracle.
    """

    factor: int
    policy: Policy = DEFAULT_POLICY
    shuffle: bool = True

    @nn.compact
    def __call__(self, x):
        import jax

        B, H, W, C = x.shape
        f = self.factor
        if f == 1:
            return x
        k = 2 * f
        init = lambda rng, shape, dtype: jnp.asarray(
            np.tile(_bilinear_upsample_kernel(f)[:, :, None], (1, 1, shape[-1])),
            dtype)
        kernel = self.param("kernel", init, (k, k, C), self.policy.param_dtype)
        p = k - 1 - f // 2
        wflip = jnp.flip(kernel, (0, 1)).astype(x.dtype)        # [k, k, C]

        if not self.shuffle:
            w = wflip[:, :, None, :]                            # [k,k,1,C]
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(1, 1), padding=[(p, p), (p, p)],
                lhs_dilation=(f, f), feature_group_count=C,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        # out[f·i+r, f·j+s] touches only input taps ky ≡ (p-r) (mod f):
        # a 2-tap depthwise conv per phase with the strided kernel slice,
        # shifted by d0 = (r + ky0 - p)/f (integral by construction)
        phases = []
        for r in range(f):
            ky0 = (p - r) % f
            dy0 = (r + ky0 - p) // f
            for s in range(f):
                kx0 = (p - s) % f
                dx0 = (s + kx0 - p) // f
                sub = wflip[ky0::f, kx0::f, :]                  # [A,Ax,C]
                pad_y = (-dy0, sub.shape[0] - 1 + dy0)
                pad_x = (-dx0, sub.shape[1] - 1 + dx0)
                phases.append(jax.lax.conv_general_dilated(
                    x, sub[:, :, None, :], (1, 1), [pad_y, pad_x],
                    feature_group_count=C,
                    dimension_numbers=("NHWC", "HWIO", "NHWC")))
        y = jnp.stack(phases, axis=3).reshape(B, H, W, f, f, C)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, f * H, f * W, C)


class DeformUpBlock(nn.Module):
    """DeformConv + BN + ReLU (pose_dla_dcn.py:345 DeformConv)."""

    features: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DeformConv2d(self.features, policy=self.policy, name="dcn")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=jnp.float32, param_dtype=self.policy.param_dtype,
                         name="bn")(x)
        return nn.relu(x).astype(self.policy.compute_dtype)


class IDAUp(nn.Module):
    """Iterative deep aggregation of a pyramid slice to a common resolution
    (pose_dla_dcn.py:361)."""

    out_channels: int
    up_factors: Tuple[int, ...]
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, layers, train: bool = False):
        layers = list(layers)
        for i in range(1, len(layers)):
            x = DeformUpBlock(self.out_channels, policy=self.policy,
                              name=f"proj_{i}")(layers[i], train)
            x = UpsampleBilinear(int(self.up_factors[i]), name=f"up_{i}")(x)
            layers[i] = DeformUpBlock(self.out_channels, policy=self.policy,
                                      name=f"node_{i}")(x + layers[i - 1], train)
        return layers


class DLAUp(nn.Module):
    """Full pyramid aggregation (pose_dla_dcn.py:390)."""

    channels: Tuple[int, ...]
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, layers, train: bool = False):
        channels = list(self.channels)
        scales = [2 ** i for i in range(len(channels))]
        layers = list(layers)
        out = [layers[-1]]
        scales_arr = list(scales)
        in_ch = list(channels)
        for i in range(len(channels) - 1):
            j = -i - 2
            ida = IDAUp(channels[j],
                        tuple(s // scales_arr[j] for s in scales_arr[j:]),
                        policy=self.policy, name=f"ida_{i}")
            sub = ida(layers[j:], train=train)
            layers[j:] = sub
            scales_arr[j + 1:] = [scales_arr[j]] * len(scales_arr[j + 1:])
            in_ch[j + 1:] = [channels[j]] * len(in_ch[j + 1:])
            out.insert(0, layers[-1])
        return out


@dataclasses.dataclass(frozen=True)
class DLASegConfig(ConfigBase):
    dla: DLAConfig = DLAConfig()
    down_ratio: int = 4
    last_level: int = 5
    head_conv: int = 256
    heads: Tuple[Tuple[str, int], ...] = (
        ("hm", 2), ("st", 8), ("wh", 8), ("ax", 256), ("cr", 256), ("reg", 2),
    )


class DLASeg(nn.Module):
    """DLA trunk + DLAUp/IDAUp neck + per-task conv heads
    (pose_dla_dcn.py:428). Returns dict of NHWC head maps at 1/down_ratio."""

    config: DLASegConfig = DLASegConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        p = self.policy
        first = int(math.log2(cfg.down_ratio))
        feats = DLA(cfg.dla, policy=p, name="base")(x, train)
        channels = cfg.dla.channels
        pyramid = DLAUp(tuple(channels[first:]), policy=p, name="dla_up")(
            feats[first:], train=train)

        # final IDA over levels [first, last_level) at the first level's res
        slice_ch = channels[first]
        y = [pyramid[i] for i in range(cfg.last_level - first)]
        y = IDAUp(slice_ch, tuple(2 ** i for i in range(cfg.last_level - first)),
                  policy=p, name="ida_up")(y, train=train)
        feat = y[-1]

        out = {}
        for head, classes in cfg.heads:
            h = nn.Conv(cfg.head_conv, (3, 3), padding=1, dtype=p.compute_dtype,
                        param_dtype=p.param_dtype, name=f"{head}_conv1")(feat)
            h = nn.relu(h)
            bias_init = (nn.initializers.constant(-2.19) if "hm" in head
                         else nn.initializers.zeros)
            h = nn.Conv(classes, (1, 1), dtype=p.compute_dtype,
                        param_dtype=p.param_dtype, bias_init=bias_init,
                        name=f"{head}_out")(h)
            out[head] = h.astype(jnp.float32)
        return out


# ---------------- DLA-v0 neck (DocXLayout) ----------------
# Reference DocumentUnderstanding/DocXLayout/models/networks/
# dlav0_subfield.py: IDAUp (:PROJ conv1x1+BN+ReLU / identity, UP fixed-
# bilinear grouped ConvTranspose / identity, NODE conv3x3 on concat
# +BN+ReLU) and DLAUp composing IDAUp stages. Unlike the pose_dla_dcn
# neck above there is no deformable conv anywhere, projection applies to
# EVERY input level (including the first), and nodes consume the
# CONCATENATION of the running aggregate with the next level.


class ProjV0(nn.Module):
    """conv1x1 (no bias) + BN + ReLU (dlav0 IDAUp proj)."""

    features: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.policy
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=p.compute_dtype, param_dtype=p.param_dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="bn")(x)
        return nn.relu(x).astype(p.compute_dtype)


class NodeV0(nn.Module):
    """conv3x3 (no bias) over channel-concat + BN + ReLU (dlav0 node)."""

    features: int
    kernel: int = 3
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.policy
        k = self.kernel
        x = nn.Conv(self.features, (k, k), use_bias=False,
                    padding=[(k // 2, k // 2)] * 2, dtype=p.compute_dtype,
                    param_dtype=p.param_dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=jnp.float32, param_dtype=p.param_dtype,
                         name="bn")(x)
        return nn.relu(x).astype(p.compute_dtype)


class IDAUpV0(nn.Module):
    """dlav0 IDAUp: project+upsample every level, then chain concat-nodes.
    Returns (final aggregate, list of node outputs)."""

    out_channels: int
    in_channels: Tuple[int, ...]
    up_factors: Tuple[int, ...]
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, layers, train: bool = False):
        layers = list(layers)
        for i, (c, f) in enumerate(zip(self.in_channels, self.up_factors)):
            x = layers[i]
            if c != self.out_channels:
                x = ProjV0(self.out_channels, policy=self.policy,
                           name=f"proj_{i}")(x, train)
            if int(f) != 1:
                x = UpsampleBilinear(int(f), name=f"up_{i}")(x)
            layers[i] = x
        x = layers[0]
        ys = []
        for i in range(1, len(layers)):
            x = NodeV0(self.out_channels, policy=self.policy,
                       name=f"node_{i}")(
                jnp.concatenate([x, layers[i]], axis=-1), train)
            ys.append(x)
        return x, ys


class DLAUpV0(nn.Module):
    """dlav0 DLAUp: iteratively aggregate the pyramid down to the first
    level's resolution; returns the final aggregate map."""

    channels: Tuple[int, ...]
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, layers, train: bool = False):
        channels = list(self.channels)
        scales = [2 ** i for i in range(len(channels))]
        in_ch = list(channels)
        layers = list(layers)
        x = layers[-1]
        for i in range(len(channels) - 1):
            j = -i - 2
            ida = IDAUpV0(channels[j], tuple(in_ch[j:]),
                          tuple(s // scales[j] for s in scales[j:]),
                          policy=self.policy, name=f"ida_{i}")
            x, ys = ida(layers[j:], train=train)
            layers[j + 1:] = ys
            scales[j + 1:] = [scales[j]] * len(scales[j + 1:])
            in_ch[j + 1:] = [channels[j]] * len(in_ch[j + 1:])
        return x


class DLASegV0(nn.Module):
    """dlav0_subfield DLASeg: DLA trunk -> DLAUpV0 -> per-task heads
    (conv3x3 + ReLU + conv1x1; hm* heads bias-init -2.19)."""

    config: DLASegConfig = DLASegConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        p = self.policy
        first = int(math.log2(cfg.down_ratio))
        feats = DLA(cfg.dla, policy=p, name="base")(x, train)
        feat = DLAUpV0(tuple(cfg.dla.channels[first:]), policy=p,
                       name="dla_up")(feats[first:], train=train)
        out = {}
        for head, classes in cfg.heads:
            h = nn.Conv(cfg.head_conv, (3, 3), padding=1,
                        dtype=p.compute_dtype, param_dtype=p.param_dtype,
                        name=f"{head}_conv1")(feat)
            h = nn.relu(h)
            bias_init = (nn.initializers.constant(-2.19) if "hm" in head
                         else nn.initializers.zeros)
            h = nn.Conv(classes, (1, 1), dtype=p.compute_dtype,
                        param_dtype=p.param_dtype, bias_init=bias_init,
                        name=f"{head}_out")(h)
            out[head] = h.astype(jnp.float32)
        return out
