"""GEM/MarkupLM encoder import parity vs a torch mirror of the HF
MarkupLM key layout (per-depth xpath tables, BERT post-norm layers)."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.checkpoint import import_gem_markuplm
from advancedliteratemachinery_tpu.models.gem import GEMConfig, GEMEncoder

H, HEADS, LAYERS = 32, 2, 2
VOCAB, POS, DEPTH, TAGV, SUBV, UNIT = 50, 16, 3, 7, 5, 4
S = 6


class TXPath(nn.Module):
    def __init__(self):
        super().__init__()
        self.xpath_tag_sub_embeddings = nn.ModuleList(
            [nn.Embedding(TAGV, UNIT) for _ in range(DEPTH)])
        self.xpath_subs_sub_embeddings = nn.ModuleList(
            [nn.Embedding(SUBV, UNIT) for _ in range(DEPTH)])
        self.xpath_unitseq2_inner = nn.Linear(UNIT * DEPTH, 4 * H)
        self.inner2emb = nn.Linear(4 * H, H)

    def forward(self, tags, subs):
        t = torch.cat([e(tags[:, :, i]) for i, e in
                       enumerate(self.xpath_tag_sub_embeddings)], -1)
        s = torch.cat([e(subs[:, :, i]) for i, e in
                       enumerate(self.xpath_subs_sub_embeddings)], -1)
        return self.inner2emb(torch.relu(self.xpath_unitseq2_inner(t + s)))


class TLayer(nn.Module):
    def __init__(self):
        super().__init__()
        class A: pass
        self.attention = A()
        self.attention.self = A()
        self.attention.self.query = nn.Linear(H, H)
        self.attention.self.key = nn.Linear(H, H)
        self.attention.self.value = nn.Linear(H, H)
        self.attention.output = A()
        self.attention.output.dense = nn.Linear(H, H)
        self.attention.output.LayerNorm = nn.LayerNorm(H, eps=1e-12)
        self.intermediate = A()
        self.intermediate.dense = nn.Linear(H, 4 * H)
        self.output = A()
        self.output.dense = nn.Linear(4 * H, H)
        self.output.LayerNorm = nn.LayerNorm(H, eps=1e-12)
        # register for state_dict
        self.add_module("attention_self_query", self.attention.self.query)

    def forward(self, x):
        hd = H // HEADS
        B, T, _ = x.shape
        def split(t):
            return t.view(B, T, HEADS, hd).permute(0, 2, 1, 3)
        q = split(self.attention.self.query(x))
        k = split(self.attention.self.key(x))
        v = split(self.attention.self.value(x))
        a = torch.softmax(q @ k.transpose(-1, -2) / hd ** 0.5, -1)
        o = (a @ v).permute(0, 2, 1, 3).reshape(B, T, H)
        x = self.attention.output.LayerNorm(x + self.attention.output.dense(o))
        h = torch.nn.functional.gelu(self.intermediate.dense(x))
        return self.output.LayerNorm(x + self.output.dense(h))


def torch_sd(emb_word, emb_pos, emb_tt, emb_ln, xpath, layers):
    sd = {
        "markuplm.embeddings.word_embeddings.weight": emb_word.weight,
        "markuplm.embeddings.position_embeddings.weight": emb_pos.weight,
        "markuplm.embeddings.token_type_embeddings.weight": emb_tt.weight,
        "markuplm.embeddings.LayerNorm.weight": emb_ln.weight,
        "markuplm.embeddings.LayerNorm.bias": emb_ln.bias,
    }
    xp = "markuplm.embeddings.xpath_embeddings."
    for d in range(DEPTH):
        sd[f"{xp}xpath_tag_sub_embeddings.{d}.weight"] = \
            xpath.xpath_tag_sub_embeddings[d].weight
        sd[f"{xp}xpath_subs_sub_embeddings.{d}.weight"] = \
            xpath.xpath_subs_sub_embeddings[d].weight
    for n, m in (("xpath_unitseq2_inner", xpath.xpath_unitseq2_inner),
                 ("inner2emb", xpath.inner2emb)):
        sd[f"{xp}{n}.weight"] = m.weight
        sd[f"{xp}{n}.bias"] = m.bias
    for i, l in enumerate(layers):
        pre = f"markuplm.encoder.layer.{i}."
        for n, m in (("attention.self.query", l.attention.self.query),
                     ("attention.self.key", l.attention.self.key),
                     ("attention.self.value", l.attention.self.value),
                     ("attention.output.dense", l.attention.output.dense),
                     ("attention.output.LayerNorm", l.attention.output.LayerNorm),
                     ("intermediate.dense", l.intermediate.dense),
                     ("output.dense", l.output.dense),
                     ("output.LayerNorm", l.output.LayerNorm)):
            sd[pre + n + ".weight"] = m.weight
            sd[pre + n + ".bias"] = m.bias
    return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.mark.model
class TestGEMImport:
    def test_encoder_parity(self):
        torch.manual_seed(0)
        emb_word = nn.Embedding(VOCAB, H)
        emb_pos = nn.Embedding(POS, H)
        emb_tt = nn.Embedding(2, H)
        emb_ln = nn.LayerNorm(H, eps=1e-12)
        xpath = TXPath()
        layers = [TLayer() for _ in range(LAYERS)]
        sd = torch_sd(emb_word, emb_pos, emb_tt, emb_ln, xpath, layers)

        cfg = GEMConfig(vocab_size=VOCAB, hidden_size=H, num_layers=LAYERS,
                        heads=HEADS, max_position=POS, max_xpath_depth=DEPTH,
                        xpath_tag_vocab=TAGV, xpath_subs_vocab=SUBV,
                        xpath_unit_hidden=UNIT, use_render_bbox=False)
        model = GEMEncoder(cfg, policy=FP32_POLICY)
        rng = np.random.default_rng(0)
        batch = {
            "input_ids": jnp.asarray(rng.integers(0, VOCAB, (2, S))),
            "attention_mask": jnp.ones((2, S)),
            "xpath_tags_seq": jnp.asarray(
                rng.integers(0, TAGV, (2, S, DEPTH))),
            "xpath_subs_seq": jnp.asarray(
                rng.integers(0, SUBV, (2, S, DEPTH))),
        }
        variables = model.init(jax.random.PRNGKey(0), batch)
        variables = import_gem_markuplm(
            sd, jax.tree.map(np.asarray, variables))

        # torch forward with plain arange positions (our position scheme)
        ids = torch.from_numpy(np.asarray(batch["input_ids"]))
        with torch.no_grad():
            x = emb_word(ids) + emb_pos(torch.arange(S))[None] \
                + emb_tt(torch.zeros_like(ids)) \
                + xpath(torch.from_numpy(np.asarray(batch["xpath_tags_seq"])),
                        torch.from_numpy(np.asarray(batch["xpath_subs_seq"])))
            x = emb_ln(x)
            for l in layers:
                x = l(x)
        got = model.apply(variables, batch)
        np.testing.assert_allclose(np.asarray(got), x.numpy(),
                                   rtol=2e-3, atol=2e-3)
