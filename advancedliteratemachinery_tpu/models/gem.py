"""GEM: Gestalt-enhanced markup language model for web understanding.

Behavioral parity target (reference DocumentUnderstanding/GEM): the repo
ships fine-tuning drivers over a MarkupLM-base encoder (examples/
fine_tuning/run_swde/run.py:129 feeds input_ids + xpath_tags_seq +
xpath_subs_seq; run_websrc QA). This module provides the TPU-native
encoder with MarkupLM's xpath embeddings — per-depth tag-id and subscript
embeddings summed into the token embedding — extended with GEM's render-
tree ("gestalt") bbox embedding, plus the two task heads:
- SWDE attribute extraction: token classification over node first tokens.
- WebSRC QA: start/end span prediction.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.core.registry import MODELS
from advancedliteratemachinery_tpu.models.vlpt import TransformerEncoderLayer


@dataclasses.dataclass(frozen=True)
class GEMConfig(ConfigBase):
    vocab_size: int = 30522
    hidden_size: int = 256
    num_layers: int = 6
    heads: int = 8
    max_position: int = 512
    max_xpath_depth: int = 50           # MarkupLM: 50 units deep
    xpath_tag_vocab: int = 216          # HTML tag vocabulary (+unk/pad)
    xpath_subs_vocab: int = 1024        # sibling subscripts
    xpath_unit_hidden: int = 32
    type_vocab: int = 2                 # BERT token-type table
    use_render_bbox: bool = True        # GEM's gestalt signal
    num_labels: int = 9                 # SWDE attribute classes


class XPathEmbedding(nn.Module):
    """MarkupLM xpath embedding: PER-DEPTH tag + subscript embedding
    tables (HF MarkupLMXPathEmbeddings keeps one nn.Embedding per depth
    unit — modeled here as single [depth, vocab, unit] params indexed by
    id + depth*vocab so released MarkupLM/GEM checkpoints import by
    stacking), concatenated over depth, then inner(4h) → ReLU →
    inner2emb(h)."""

    cfg: GEMConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, xpath_tags_seq, xpath_subs_seq):
        cfg = self.cfg
        p = self.policy
        depth = cfg.max_xpath_depth
        offs = jnp.arange(depth) * cfg.xpath_tag_vocab
        tag_emb = nn.Embed(depth * cfg.xpath_tag_vocab, cfg.xpath_unit_hidden,
                           param_dtype=p.param_dtype, name="tag_emb")(
            xpath_tags_seq + offs)               # [B,S,depth,unit]
        offs = jnp.arange(depth) * cfg.xpath_subs_vocab
        sub_emb = nn.Embed(depth * cfg.xpath_subs_vocab, cfg.xpath_unit_hidden,
                           param_dtype=p.param_dtype, name="subs_emb")(
            xpath_subs_seq + offs)
        B, S, depth, unit = tag_emb.shape
        x = (tag_emb + sub_emb).reshape(B, S, depth * unit)
        x = nn.Dense(4 * cfg.hidden_size, dtype=p.compute_dtype,
                     param_dtype=p.param_dtype, name="proj1")(
            x.astype(p.compute_dtype))
        x = nn.relu(x)
        x = nn.Dense(cfg.hidden_size, dtype=p.compute_dtype,
                     param_dtype=p.param_dtype, name="proj2")(x)
        return x


@MODELS.register("gem")
class GEMEncoder(nn.Module):
    config: GEMConfig = GEMConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic=True):
        """batch: input_ids [B,S], attention_mask [B,S], xpath_tags_seq /
        xpath_subs_seq [B,S,depth], optional render_bbox [B,S,4] in [0,1]."""
        cfg = self.config
        p = self.policy
        ids = batch["input_ids"]
        S = ids.shape[1]
        if S > cfg.max_position:
            # OOB rows of the position table would silently fill NaN
            # (jnp.take fill semantics outside jit)
            raise ValueError(
                f"sequence length {S} exceeds max_position "
                f"{cfg.max_position}; shorten the batch max_seq or grow "
                f"the config")
        emb = nn.Embed(cfg.vocab_size, cfg.hidden_size, param_dtype=p.param_dtype,
                       name="word_embeddings")(ids)
        emb = emb + nn.Embed(cfg.max_position, cfg.hidden_size,
                             param_dtype=p.param_dtype,
                             name="position_embeddings")(jnp.arange(S))[None]
        tt = batch.get("token_type_ids", jnp.zeros_like(ids))
        emb = emb + nn.Embed(cfg.type_vocab, cfg.hidden_size,
                             param_dtype=p.param_dtype,
                             name="token_type_embeddings")(tt)
        emb = emb + XPathEmbedding(cfg, policy=p, name="xpath")(
            batch["xpath_tags_seq"], batch["xpath_subs_seq"]).astype(emb.dtype)
        if cfg.use_render_bbox and "render_bbox" in batch:
            emb = emb + nn.Dense(cfg.hidden_size, dtype=p.compute_dtype,
                                 param_dtype=p.param_dtype, name="bbox_proj")(
                batch["render_bbox"].astype(p.compute_dtype)).astype(emb.dtype)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                         param_dtype=p.param_dtype, name="emb_norm")(
            emb).astype(p.compute_dtype)
        for i in range(cfg.num_layers):
            x = TransformerEncoderLayer(cfg.hidden_size, cfg.heads, policy=p,
                                        name=f"layer_{i}")(
                x, batch["attention_mask"])
        return x


class GEMForSWDE(nn.Module):
    """Token classification over node tokens (run_swde/run.py)."""

    config: GEMConfig = GEMConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, batch, deterministic=True):
        x = GEMEncoder(self.config, policy=self.policy, name="gem")(
            batch, deterministic)
        return nn.Dense(self.config.num_labels, dtype=self.policy.compute_dtype,
                        param_dtype=self.policy.param_dtype,
                        name="classifier")(x).astype(jnp.float32)


class GEMForWebSRC(nn.Module):
    """Span QA: start/end logits (run_websrc/run.py)."""

    config: GEMConfig = GEMConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, batch, deterministic=True):
        x = GEMEncoder(self.config, policy=self.policy, name="gem")(
            batch, deterministic)
        logits = nn.Dense(2, dtype=self.policy.compute_dtype,
                          param_dtype=self.policy.param_dtype,
                          name="qa_outputs")(x).astype(jnp.float32)
        return {"start_logits": logits[..., 0], "end_logits": logits[..., 1]}
