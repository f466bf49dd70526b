"""WebRPG FID feature-model import parity vs a torch mirror of
baselines_model/FID_model.py (FIDWebModel: element VAE latents + chrlen
embedding + MarkupLM xpath embeddings → BERT FIDBackbone → real/fake
logits + pooled FID feature). Reuses the verified VAE and xpath mirrors
from test_webrpg_import / test_gem_import."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

import tests.test_gem_import as G
import tests.test_webrpg_import as W
from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.checkpoint import import_fid_web
from advancedliteratemachinery_tpu.models.gem import GEMConfig
from advancedliteratemachinery_tpu.models.webrpg import (
    FIDConfig,
    FIDWebModel,
    WebRPGConfig,
    make_fid_feature_fn,
)

D = 16          # backbone embed
E = 4           # elements per page
CHRD = 8


class TFidBackbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.in_embed = nn.Linear(W.LATENT, D)
        self.cls_text_embed = nn.Parameter(torch.randn(1, 1, D))
        self.chrlen_embed = nn.Linear(CHRD, D)
        self.xpath_embed = nn.Linear(G.H, D)
        emb = nn.Module()
        emb.word_embeddings = nn.Embedding(4, D)
        emb.position_embeddings = nn.Embedding(1 + E, D)
        emb.token_type_embeddings = nn.Embedding(2, D)
        emb.LayerNorm = nn.LayerNorm(D, eps=1e-12)
        self.bert = nn.Module()
        self.bert.embeddings = emb
        self.bert.encoder = nn.Module()
        layers = []
        for _ in range(2):
            l = nn.Module()
            att = nn.Module()
            att.self = nn.Module()
            att.self.query = nn.Linear(D, D)
            att.self.key = nn.Linear(D, D)
            att.self.value = nn.Linear(D, D)
            att.output = nn.Module()
            att.output.dense = nn.Linear(D, D)
            att.output.LayerNorm = nn.LayerNorm(D, eps=1e-12)
            l.attention = att
            l.intermediate = nn.Module()
            l.intermediate.dense = nn.Linear(D, 4 * D)
            l.output = nn.Module()
            l.output.dense = nn.Linear(4 * D, D)
            l.output.LayerNorm = nn.LayerNorm(D, eps=1e-12)
            layers.append(l)
        self.bert.encoder.layer = nn.ModuleList(layers)
        pooler = nn.Module()
        pooler.dense = nn.Linear(D, D)
        self.bert.pooler = pooler
        self.norm = nn.LayerNorm(D)                  # defined, never used
        self.decoder_pred = nn.Linear(D, 2)

    def forward(self, latents, chrlen_emb, xpath_emb, element_mask):
        x = (self.in_embed(latents) + self.chrlen_embed(chrlen_emb)
             + self.xpath_embed(xpath_emb))
        B = x.shape[0]
        x = torch.cat([self.cls_text_embed.expand(B, 1, D), x], dim=1)
        T = x.shape[1]
        emb = self.bert.embeddings
        x = x + emb.position_embeddings.weight[None, :T]
        x = x + emb.token_type_embeddings(
            torch.zeros(T, dtype=torch.long))[None]
        x = emb.LayerNorm(x)
        mask = torch.cat([torch.ones(B, 1), element_mask], dim=1)
        bias = torch.where(mask[:, None, None, :] > 0,
                           torch.zeros(()), torch.full((), -1e9))
        H_, hd = 2, D // 2
        for l in self.bert.encoder.layer:
            q = l.attention.self.query(x).view(B, T, H_, hd)
            k = l.attention.self.key(x).view(B, T, H_, hd)
            v = l.attention.self.value(x).view(B, T, H_, hd)
            s = torch.einsum("bqhd,bkhd->bhqk", q, k) / hd ** 0.5 + bias
            a = s.softmax(-1)
            o = torch.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, T, D)
            x = l.attention.output.LayerNorm(x + l.attention.output.dense(o))
            h = torch.nn.functional.gelu(l.intermediate.dense(x))
            x = l.output.LayerNorm(x + l.output.dense(h))
        pooled = torch.tanh(self.bert.pooler.dense(x[:, 0]))
        return self.decoder_pred(pooled), pooled


class TFidWeb(nn.Module):
    def __init__(self):
        super().__init__()
        self.model = TFidBackbone()
        self.chrlen_embed = nn.Embedding(10, CHRD)
        self.vae = W.TVAE()
        self.xpath_layer = G.TXPath()

    def forward(self, param_ids, chrlen, tags, subs, element_mask):
        B, E_, P = param_ids.shape
        mu, _ = self.vae.encode(param_ids.view(B * E_, P))
        z = mu.view(B, E_, -1)                       # deterministic latent
        return self.model(z, self.chrlen_embed(chrlen),
                          self.xpath_layer(tags, subs), element_mask)


def _flax_model():
    return FIDWebModel(
        cfg=WebRPGConfig(param_vocab=W.VOCAB, parameters_len=W.T,
                         latent_dim=W.LATENT, vae_hidden=W.HIDDEN),
        fid=FIDConfig(out_dim=2, embed_dim=D, depth=2, heads=2,
                      num_element_tokens=E, chrlen_dim=CHRD,
                      xpath_dim=G.H, max_chrlen=10),
        gem_cfg=GEMConfig(hidden_size=G.H, max_xpath_depth=G.DEPTH,
                          xpath_tag_vocab=G.TAGV, xpath_subs_vocab=G.SUBV,
                          xpath_unit_hidden=G.UNIT),
        policy=FP32_POLICY)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "param_ids": rng.integers(0, W.VOCAB, (2, E, W.T)).astype(np.int32),
        "chrlen": rng.integers(0, 10, (2, E)).astype(np.int32),
        "tags": rng.integers(0, G.TAGV, (2, E, G.DEPTH)).astype(np.int32),
        "subs": rng.integers(0, G.SUBV, (2, E, G.DEPTH)).astype(np.int32),
        "mask": np.array([[1, 1, 1, 0], [1, 1, 0, 0]], np.float32),
    }


class TestFidWebImport:
    def test_logits_and_features_match(self):
        torch.manual_seed(0)
        tm = TFidWeb().eval()
        model = _flax_model()
        iv = _inputs()
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(iv["param_ids"]),
            jnp.asarray(iv["chrlen"]), jnp.asarray(iv["tags"]),
            jnp.asarray(iv["subs"]), jnp.asarray(iv["mask"]),
            jax.random.PRNGKey(1))
        variables = import_fid_web(tm.state_dict(), dict(variables))

        with torch.no_grad():
            want_logits, want_pooled = tm(
                torch.from_numpy(iv["param_ids"].astype(np.int64)),
                torch.from_numpy(iv["chrlen"].astype(np.int64)),
                torch.from_numpy(iv["tags"].astype(np.int64)),
                torch.from_numpy(iv["subs"].astype(np.int64)),
                torch.from_numpy(iv["mask"]))
        out = model.apply(
            variables, jnp.asarray(iv["param_ids"]),
            jnp.asarray(iv["chrlen"]), jnp.asarray(iv["tags"]),
            jnp.asarray(iv["subs"]), jnp.asarray(iv["mask"]),
            jax.random.PRNGKey(1), sample=False)
        np.testing.assert_allclose(np.asarray(out["output"]),
                                   want_logits.numpy(), rtol=2e-3,
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(out["hidden_state"]),
                                   want_pooled.numpy(), rtol=2e-3,
                                   atol=2e-3)

    def test_masked_elements_do_not_affect_features(self):
        torch.manual_seed(0)
        tm = TFidWeb().eval()
        model = _flax_model()
        iv = _inputs()
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(iv["param_ids"]),
            jnp.asarray(iv["chrlen"]), jnp.asarray(iv["tags"]),
            jnp.asarray(iv["subs"]), jnp.asarray(iv["mask"]),
            jax.random.PRNGKey(1))
        variables = import_fid_web(tm.state_dict(), dict(variables))

        def run(pids):
            return np.asarray(model.apply(
                variables, jnp.asarray(pids), jnp.asarray(iv["chrlen"]),
                jnp.asarray(iv["tags"]), jnp.asarray(iv["subs"]),
                jnp.asarray(iv["mask"]), jax.random.PRNGKey(1),
                sample=False)["hidden_state"])

        base = run(iv["param_ids"])
        corrupted = iv["param_ids"].copy()
        corrupted[0, 3] = (corrupted[0, 3] + 7) % W.VOCAB   # masked slot
        np.testing.assert_allclose(run(corrupted), base, atol=1e-5)

    def test_feature_fn_feeds_webrpg_harness(self):
        from advancedliteratemachinery_tpu.eval.webrpg_metrics import (
            webrpg_run_tests,
        )

        torch.manual_seed(0)
        tm = TFidWeb().eval()
        model = _flax_model()
        iv = _inputs()
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(iv["param_ids"]),
            jnp.asarray(iv["chrlen"]), jnp.asarray(iv["tags"]),
            jnp.asarray(iv["subs"]), jnp.asarray(iv["mask"]),
            jax.random.PRNGKey(1))
        variables = import_fid_web(tm.state_dict(), dict(variables))
        feature_fn = make_fid_feature_fn(model, variables)

        rng = np.random.default_rng(3)
        recs = []
        for b in range(2):
            gt = rng.integers(1, W.VOCAB - 1, (E, W.T)).astype(np.float64)
            recs.append({
                "pred": gt.copy(), "gt": gt,
                "element_mask": iv["mask"][b],
                "unique_tids": np.arange(E),
                "chrlen": iv["chrlen"][b],
                "all_xpath_tags_seq": iv["tags"][b],
                "all_xpath_subs_seq": iv["subs"][b],
            })
        out = webrpg_run_tests(recs, feature_fn, pad_value=W.VOCAB - 1,
                               layout_cols=4)
        assert abs(out["fid_overall"]) < 1e-6       # pred == gt
        assert set(out) >= {"fid_overall", "fid_layout", "fid_style",
                            "elements_iou", "style_consistency"}
