"""WebRPG: web rendering-parameter generation (element VAE + BART AR).

Behavioral parity target (reference DocumentUnderstanding/WebRPG):
- Element VAE (baselines_model/vae.py:35): per-parameter one-hot → 128-d
  reduction → flatten → MLP encoder (hidden 256→...→16) → (mu, logvar) →
  MLP decoder → per-parameter logits; loss = recon CE + kld_weight·KLD.
- BartVAEBackbone (baselines_model/BART_vae_web_rendering.py:10): element
  tokens = param-latent embed + element-text embed + xpath embed + chrlen
  embed, prepended with a global-text token, run through a BART-style
  encoder-decoder on input embeddings; prediction head regresses the next
  element's VAE latent (trainer_ar.py compute_loss).
"""

from __future__ import annotations

import dataclasses

import numpy as np
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.core.registry import MODELS
from advancedliteratemachinery_tpu.models.vlpt import TransformerEncoderLayer
from advancedliteratemachinery_tpu.models.geolayoutlm import CrossModalLayer


@dataclasses.dataclass(frozen=True)
class WebRPGConfig(ConfigBase):
    param_vocab: int = 256        # per-parameter value vocabulary (input_dim)
    parameters_len: int = 24      # rendering parameters per element
    latent_dim: int = 32
    vae_hidden: Tuple[int, ...] = (16, 32, 64, 128, 256)
    embed_dim: int = 128
    enc_layers: int = 3
    dec_layers: int = 3
    heads: int = 4
    global_text_dim: int = 128
    element_text_dim: int = 128
    xpath_dim: int = 64
    chrlen_vocab: int = 512
    kld_weight: float = 0.001
    vae_loss_weight: float = 1.0


class ElementVAE(nn.Module):
    """vae.py:35 — exact layer structure with LeakyReLU(0.01)."""

    cfg: WebRPGConfig
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        cfg = self.cfg
        p = self.policy
        d = dict(dtype=p.compute_dtype, param_dtype=p.param_dtype)
        self.dimension_reduction = nn.Dense(128, **d)
        self.encoder_input = nn.Dense(cfg.vae_hidden[-1], **d)
        self.enc_stack = [nn.Dense(h, **d) for h in cfg.vae_hidden[::-1]]
        self.enc_norms = [nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype)
                          for _ in cfg.vae_hidden]
        self.enc_mu = nn.Dense(cfg.latent_dim, **d)
        self.enc_logvar = nn.Dense(cfg.latent_dim, **d)
        self.dec_stack = [nn.Dense(h, **d) for h in cfg.vae_hidden]
        self.dec_norms = [nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype)
                          for _ in cfg.vae_hidden]
        self.final_layer = nn.Dense(128 * cfg.parameters_len, **d)
        self.final_layer2 = nn.Dense(cfg.param_vocab, **d)

    def _act(self, x):
        return nn.leaky_relu(x, 0.01)

    def encode(self, param_ids):
        """param_ids [B, T] ints → (mu, logvar) [B, latent]."""
        cfg = self.cfg
        onehot = jax.nn.one_hot(param_ids, cfg.param_vocab,
                                dtype=self.policy.compute_dtype)
        emb = self._act(self.dimension_reduction(onehot))       # [B,T,128]
        x = self._act(self.encoder_input(emb.reshape(emb.shape[0], -1)))
        for dense, norm in zip(self.enc_stack, self.enc_norms):
            x = self._act(norm(dense(x)).astype(x.dtype))
        return self.enc_mu(x), self.enc_logvar(x)

    def decode(self, z):
        cfg = self.cfg
        x = z
        for dense, norm in zip(self.dec_stack, self.dec_norms):
            x = self._act(norm(dense(x)).astype(x.dtype))
        x = self._act(self.final_layer(x))
        x = x.reshape(x.shape[0], cfg.parameters_len, 128)
        return self.final_layer2(x).astype(jnp.float32)         # [B,T,vocab]

    def __call__(self, param_ids, rng):
        mu, logvar = self.encode(param_ids)
        eps = jax.random.normal(rng, mu.shape, mu.dtype)
        z = mu + eps * jnp.exp(0.5 * logvar)
        return self.decode(z), mu, logvar, z


def vae_loss(recon_logits, param_ids, mu, logvar, kld_weight: float
             ) -> Dict[str, jnp.ndarray]:
    logp = jax.nn.log_softmax(recon_logits, -1)
    nll = -jnp.take_along_axis(logp, param_ids[..., None], -1)[..., 0]
    recon = jnp.mean(jnp.sum(nll, axis=-1))
    kld = -0.5 * jnp.mean(jnp.sum(
        1 + logvar - mu ** 2 - jnp.exp(logvar), axis=-1))
    return {"vae_loss": recon + kld_weight * kld, "recon": recon, "kld": kld}


@MODELS.register("webrpg")
class WebRPGModel(nn.Module):
    """BartVAEBackbone + latent regression (BART_vae_web_rendering.py:10)."""

    config: WebRPGConfig = WebRPGConfig()
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        cfg = self.config
        p = self.policy
        d = dict(dtype=p.compute_dtype, param_dtype=p.param_dtype)
        self.vae = ElementVAE(cfg, policy=p)
        self.in_embed = nn.Dense(cfg.embed_dim, **d)
        self.global_text_embed = nn.Dense(cfg.embed_dim, **d)
        self.element_text_embed = nn.Dense(cfg.embed_dim, **d)
        self.chrlen_table = nn.Embed(cfg.chrlen_vocab, cfg.embed_dim,
                                     param_dtype=p.param_dtype)
        self.xpath_embed = nn.Dense(cfg.embed_dim, **d)
        self.pos_embed = nn.Embed(1024, cfg.embed_dim, param_dtype=p.param_dtype)
        self.encoder = [TransformerEncoderLayer(cfg.embed_dim, cfg.heads, policy=p,
                                                name=f"enc_{i}")
                        for i in range(cfg.enc_layers)]
        self.decoder = [CrossModalLayer(cfg.embed_dim, cfg.heads,
                                        4 * cfg.embed_dim, policy=p,
                                        name=f"dec_{i}")
                        for i in range(cfg.dec_layers)]
        self.decoder_pred = nn.Dense(cfg.latent_dim, **d)

    def __call__(self, batch: Dict[str, jnp.ndarray], rng,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        """batch: param_ids [B,N,T] per-element rendering params,
        global_text [B,1,Dg], element_text [B,N,De], chrlen [B,N] ints,
        xpath [B,N,Dx], element_mask [B,N]."""
        cfg = self.config
        B, N, T = batch["param_ids"].shape

        flat = batch["param_ids"].reshape(B * N, T)
        recon, mu, logvar, z = self.vae(flat, rng)
        latents = z.reshape(B, N, cfg.latent_dim)

        elem = (self.in_embed(latents)
                + self.element_text_embed(batch["element_text"].astype(latents.dtype))
                + self.xpath_embed(batch["xpath"].astype(latents.dtype))
                + self.chrlen_table(batch["chrlen"]).astype(latents.dtype))
        g = self.global_text_embed(batch["global_text"].astype(latents.dtype))
        x = jnp.concatenate([g, elem], axis=1)
        x = x + self.pos_embed(jnp.arange(x.shape[1]))[None].astype(x.dtype)
        mask = jnp.concatenate(
            [jnp.ones((B, 1)), batch["element_mask"].astype(jnp.float32)], axis=1)

        memory = x
        for layer in self.encoder:
            memory = layer(memory, mask)
        out = x
        for layer in self.decoder:
            out = layer(out, memory, mask, mask)
        pred_latents = self.decoder_pred(out[:, 1:])             # drop global token

        return {"pred_latents": pred_latents.astype(jnp.float32),
                "latents": latents.astype(jnp.float32),
                "recon_logits": recon.reshape(B, N, T, cfg.param_vocab),
                "mu": mu, "logvar": logvar}

    def render_params(self, pred_latents):
        """Decode predicted latents back to parameter logits (inference)."""
        B, N, L = pred_latents.shape
        return self.vae.decode(pred_latents.reshape(B * N, L)).reshape(
            B, N, self.config.parameters_len, self.config.param_vocab)


def webrpg_losses(out: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray],
                  cfg: WebRPGConfig) -> Dict[str, jnp.ndarray]:
    B, N, T = batch["param_ids"].shape
    v = vae_loss(out["recon_logits"].reshape(B * N, T, -1),
                 batch["param_ids"].reshape(B * N, T),
                 out["mu"], out["logvar"], cfg.kld_weight)
    m = batch["element_mask"].astype(jnp.float32)[..., None]
    ar = jnp.sum(((out["pred_latents"] - jax.lax.stop_gradient(out["latents"]))
                  ** 2) * m) / jnp.maximum(jnp.sum(m), 1.0)
    total = ar + cfg.vae_loss_weight * v["vae_loss"]
    return {"loss": total, "ar_loss": ar, **v}


# ---------------- FID feature model (generative evaluation) ----------------


@dataclasses.dataclass(frozen=True)
class FIDConfig(ConfigBase):
    """Reference baselines_model/FID_model.py FIDBackbone/FIDWebModel
    (built at test_FID.py:61: embed 128, depth 4, 2-way real/fake head,
    chrlen Embedding(512, 128), xpath from MarkupLM embeddings)."""

    out_dim: int = 2
    embed_dim: int = 128
    depth: int = 4
    heads: int = 8
    num_element_tokens: int = 512
    chrlen_dim: int = 128
    xpath_dim: int = 1024
    max_chrlen: int = 512


class FIDBackbone(nn.Module):
    """BERT encoder over [CLS] + element tokens; pooled CLS feature is the
    FID activation (FID_model.py:39 forward → output.pooler_output)."""

    cfg: FIDConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, param_latents, chrlen_emb, xpath_emb, element_mask,
                 deterministic: bool = True):
        cfg, p = self.cfg, self.policy
        D, H = cfg.embed_dim, cfg.heads
        hd = D // H
        d = dict(dtype=p.compute_dtype, param_dtype=p.param_dtype)
        x = nn.Dense(D, name="in_embed", **d)(param_latents)
        x = x + nn.Dense(D, name="chrlen_embed", **d)(chrlen_emb)
        x = x + nn.Dense(D, name="xpath_embed", **d)(xpath_emb)
        B = x.shape[0]
        cls = self.param("cls_text_embed", nn.initializers.normal(1.0),
                         (1, 1, D), p.param_dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype),
                                              (B, 1, D)), x], axis=1)
        T = x.shape[1]
        # BertModel with inputs_embeds still adds position + token-type 0
        pos = nn.Embed(1 + cfg.num_element_tokens, D,
                       param_dtype=p.param_dtype, name="position_emb")(
            jnp.arange(T))
        tok = nn.Embed(2, D, param_dtype=p.param_dtype,
                       name="token_type_emb")(jnp.zeros((T,), jnp.int32))
        x = x + (pos + tok).astype(x.dtype)[None]
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                         name="emb_ln")(x).astype(p.compute_dtype)
        mask = jnp.concatenate(
            [jnp.ones((B, 1), element_mask.dtype), element_mask], axis=1)
        bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
        for i in range(cfg.depth):
            q = nn.Dense(D, name=f"layer_{i}_q", **d)(x).reshape(B, T, H, hd)
            k = nn.Dense(D, name=f"layer_{i}_k", **d)(x).reshape(B, T, H, hd)
            v = nn.Dense(D, name=f"layer_{i}_v", **d)(x).reshape(B, T, H, hd)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5) + bias
            a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, T, D)
            o = nn.Dense(D, name=f"layer_{i}_attn_out", **d)(o)
            x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                             name=f"layer_{i}_attn_ln")(x + o).astype(
                                 p.compute_dtype)
            h = nn.Dense(4 * D, name=f"layer_{i}_inter", **d)(x)
            h = nn.Dense(D, name=f"layer_{i}_out", **d)(
                jax.nn.gelu(h, approximate=False))
            x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                             name=f"layer_{i}_out_ln")(x + h).astype(
                                 p.compute_dtype)
        pooled = jnp.tanh(nn.Dense(D, name="pooler", **d)(x[:, 0]))
        logits = nn.Dense(cfg.out_dim, name="decoder_pred", **d)(pooled)
        return logits.astype(jnp.float32), pooled.astype(jnp.float32)


@MODELS.register("fid_web")
class FIDWebModel(nn.Module):
    """The FID feature extractor chain (FID_model.py FIDWebModel): element
    VAE reparameterized latents + chrlen embedding + MarkupLM xpath
    embedding → FIDBackbone → (real/fake logits, pooled FID feature).

    `gem_cfg` supplies the xpath table shapes (reference reuses the
    MarkupLM embeddings object, test_FID.py:168)."""

    cfg: WebRPGConfig = WebRPGConfig()
    fid: FIDConfig = FIDConfig()
    gem_cfg: "object" = None
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        from advancedliteratemachinery_tpu.models.gem import (
            GEMConfig,
            XPathEmbedding,
        )

        self.vae = ElementVAE(self.cfg, policy=self.policy)
        self.chrlen_table = nn.Embed(self.fid.max_chrlen,
                                     self.fid.chrlen_dim,
                                     param_dtype=self.policy.param_dtype)
        self.xpath_layer = XPathEmbedding(
            self.gem_cfg or GEMConfig(hidden_size=self.fid.xpath_dim),
            policy=self.policy)
        self.backbone = FIDBackbone(self.fid, policy=self.policy)

    def __call__(self, param_ids, chrlen, xpath_tags, xpath_subs,
                 element_mask, rng, sample: bool = True):
        """param_ids [B, E, P] ints; chrlen [B, E] ints; xpath_* [B, E,
        depth]; element_mask [B, E] → {"output" [B, 2], "hidden_state"
        [B, embed]} (the hidden_state feeds eval.webrpg_metrics FID).
        sample=False uses the VAE posterior mean (deterministic features —
        the reference reparameterizes even at eval, FID_model.py:117)."""
        B, E, P = param_ids.shape
        mu, logvar = self.vae.encode(param_ids.reshape(B * E, P))
        if sample:
            eps = jax.random.normal(rng, mu.shape, mu.dtype)
            z = mu + eps * jnp.exp(0.5 * logvar)
        else:
            z = mu
        z = z.reshape(B, E, -1)
        chrlen_emb = self.chrlen_table(chrlen)
        xpath_emb = self.xpath_layer(xpath_tags, xpath_subs)
        logits, pooled = self.backbone(z, chrlen_emb, xpath_emb,
                                       element_mask)
        return {"output": logits, "hidden_state": pooled}


def make_fid_feature_fn(model: FIDWebModel, variables, rng_seed: int = 0):
    """→ feature_fn(params [E, P], record) for
    eval.webrpg_metrics.webrpg_run_tests — records carry the reference
    .pt schema keys (element_mask, chrlen, all_xpath_tags_seq,
    all_xpath_subs_seq)."""

    def feature_fn(params, record):
        rng = jax.random.PRNGKey(rng_seed)
        out = model.apply(
            variables,
            jnp.asarray(params, jnp.int32)[None],
            jnp.asarray(record["chrlen"], jnp.int32)[None],
            jnp.asarray(record["all_xpath_tags_seq"], jnp.int32)[None],
            jnp.asarray(record["all_xpath_subs_seq"], jnp.int32)[None],
            jnp.asarray(record["element_mask"], jnp.float32)[None],
            rng)
        return np.asarray(out["hidden_state"][0])

    return feature_fn
