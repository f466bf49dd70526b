"""DocXLayout released-checkpoint import parity vs a torch mirror of
dlav0_subfield.py DLASeg (v0 neck: conv proj + fixed-bilinear grouped
ConvTranspose ups + concat nodes; NO deformable conv). Trunk mirror is
shared with test_dla_import."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from test_dla_import import CH, TDLA, fill_up

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.checkpoint import import_docxlayout
from advancedliteratemachinery_tpu.models.docxlayout import (
    DocXLayout, DocXLayoutConfig)
from advancedliteratemachinery_tpu.models.dla import DLAConfig

LEVELS = (1, 1, 1, 2, 2, 1)


class TIDAUpV0(nn.Module):
    """dlav0_subfield.py IDAUp mirror."""

    def __init__(self, node_kernel, out_dim, channels, up_factors):
        super().__init__()
        self.channels = channels
        for i, c in enumerate(channels):
            if c == out_dim:
                proj = nn.Identity()
            else:
                proj = nn.Sequential(
                    nn.Conv2d(c, out_dim, 1, 1, bias=False),
                    nn.BatchNorm2d(out_dim), nn.ReLU(inplace=True))
            f = int(up_factors[i])
            if f == 1:
                up = nn.Identity()
            else:
                up = nn.ConvTranspose2d(out_dim, out_dim, f * 2, stride=f,
                                        padding=f // 2, output_padding=0,
                                        groups=out_dim, bias=False)
                fill_up(up)
            setattr(self, f"proj_{i}", proj)
            setattr(self, f"up_{i}", up)
        for i in range(1, len(channels)):
            setattr(self, f"node_{i}", nn.Sequential(
                nn.Conv2d(out_dim * 2, out_dim, node_kernel, 1,
                          node_kernel // 2, bias=False),
                nn.BatchNorm2d(out_dim), nn.ReLU(inplace=True)))

    def forward(self, layers):
        layers = list(layers)
        for i in range(len(layers)):
            layers[i] = getattr(self, f"up_{i}")(
                getattr(self, f"proj_{i}")(layers[i]))
        x = layers[0]
        y = []
        for i in range(1, len(layers)):
            x = getattr(self, f"node_{i}")(torch.cat([x, layers[i]], 1))
            y.append(x)
        return x, y


class TDLAUpV0(nn.Module):
    def __init__(self, channels, scales):
        super().__init__()
        channels = list(channels)
        in_channels = list(channels)
        scales = np.array(scales, int)
        for i in range(len(channels) - 1):
            j = -i - 2
            setattr(self, f"ida_{i}", TIDAUpV0(
                3, channels[j], in_channels[j:],
                scales[j:] // scales[j]))
            scales[j + 1:] = scales[j]
            in_channels[j + 1:] = [channels[j] for _ in channels[j + 1:]]

    def forward(self, layers):
        layers = list(layers)
        for i in range(len(layers) - 1):
            ida = getattr(self, f"ida_{i}")
            x, y = ida(layers[-i - 2:])
            layers[-i - 1:] = y
        return x


HEADS = (("hm", 1), ("cls", 3), ("ftype", 2), ("wh", 8), ("reg", 2),
         ("hm_sub", 1), ("wh_sub", 8), ("reg_sub", 2))
HEAD_CONV = 8


class TDLASegV0(nn.Module):
    def __init__(self):
        super().__init__()
        self.base = TDLA()
        first = 2
        channels = CH[first:]
        scales = [2 ** i for i in range(len(channels))]
        self.dla_up = TDLAUpV0(channels, scales)
        self.heads = HEADS
        for head, classes in HEADS:
            fc = nn.Sequential(
                nn.Conv2d(CH[first], HEAD_CONV, 3, padding=1, bias=True),
                nn.ReLU(inplace=True),
                nn.Conv2d(HEAD_CONV, classes, 1, 1, 0, bias=True))
            if "hm" in head:
                fc[-1].bias.data.fill_(-2.19)
            setattr(self, head, fc)

    def forward(self, x):
        x = self.dla_up(self.base(x)[2:])
        return {h: getattr(self, h)(x) for h, _ in self.heads}


@pytest.mark.model
class TestDocXLayoutImport:
    def test_full_import_parity(self):
        torch.manual_seed(0)
        tm = TDLASegV0().eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        cfg = DocXLayoutConfig(
            num_classes=3, num_secondary_classes=2, top_k=8, top_k_sub=4,
            dla=DLAConfig(levels=LEVELS, channels=CH), head_conv=HEAD_CONV)
        model = DocXLayout(cfg, policy=FP32_POLICY)
        x_np = np.random.default_rng(0).standard_normal(
            (1, 64, 64, 3)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
        variables = import_docxlayout(sd, jax.tree.map(np.asarray, variables))

        with torch.no_grad():
            want = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
        got = model.apply(variables, jnp.asarray(x_np),
                          method=lambda m, im: m.backbone(im))
        for head, _ in HEADS:
            np.testing.assert_allclose(
                np.asarray(got[head]).transpose(0, 3, 1, 2),
                want[head].numpy(), rtol=2e-3, atol=2e-3)

        # end-to-end decode runs on imported weights
        out = model.apply(variables, jnp.asarray(x_np), method=model.infer)
        assert np.isfinite(np.asarray(out["detections"])).all()
        assert np.isfinite(np.asarray(out["cls_probs"])).all()
