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
