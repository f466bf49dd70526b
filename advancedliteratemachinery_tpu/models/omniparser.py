"""OmniParser: unified text spotting + KIE + table recognition (TPU-native).

Behavioral parity target (reference: OCR/OmniParser):
- Swin-B → FPN (fpn.py: laterals + nearest upsample, concat 4 maps at the
  c3 scale → 1024ch) → 1x1 stride-2 input_proj → d_model memory
  (omniparser.py:7-31, use_fpn=True per train.sh).
- DETR-style pre-norm decoder (transformer.py:430 forward_pre), 4 layers,
  d_model 512, 8 heads, ffn 2048 (parser.py:39-44, --tfm_pre_norm).
- Shared token embedding + per-task position embeddings with embedding
  LayerNorm (transformer.py:283-328 DecoderEmbeddings).
- 3-stage greedy decode (transformer.py:102 decode_pt_seq, :254-289):
  point seq (parity-masked bins/eos/class vocab) → per-point polygon seq
  (32 steps, bins only) → per-point content seq (rec_length steps, char
  vocab only); spatial prompt [0,0,nb-1,nb-1] + char-window prompt.
- Training: teacher-forced CE over the 3 sequences, padding ignored,
  weighted (pt 1 / poly 1 / rec 2 per train.sh) (engine/train.py:26-41).

TPU-first: eval decode is a `lax.scan` with a KV cache per decoder layer
(fixed max lengths, finished-lane masking) — the reference re-runs the full
prefix through the decoder every step (O(L²) per layer); the cache makes
each step O(L) and keeps everything in one compiled graph. Polygon/rec
decodes batch all detected points at once into [max_instances, ...] —
the reference already batches these (transformer.py:249-252); here the
count is padded static so the graph is reusable.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advancedliteratemachinery_tpu.codecs.coords import CoordSeqVocab
from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import Policy, DEFAULT_POLICY
from advancedliteratemachinery_tpu.core.registry import MODELS
from advancedliteratemachinery_tpu.models.swin import SWIN_VARIANTS, SwinTransformer

NEG = -1e9


def sine_position_embedding(mask: jnp.ndarray, dim: int,
                            temperature: float = 10000.0) -> jnp.ndarray:
    """DETR sine embedding from a validity mask [B, H, W] → [B, H, W, dim]
    (reference model/backbone/position_embedding.py)."""
    not_mask = mask
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    half = dim // 2
    dim_t = temperature ** (2 * (jnp.arange(half) // 2) / half)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(*mask.shape, half)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(*mask.shape, half)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class FPN(nn.Module):
    """1x1 laterals + top-down nearest, concat at c3 scale (fpn.py:12)."""

    out_dim: int = 256
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> jnp.ndarray:
        p = self.policy
        c2, c3, c4, c5 = feats
        lat = [nn.Dense(self.out_dim, dtype=p.compute_dtype,
                        param_dtype=p.param_dtype, name=f"lat{i}")
               for i in range(4)]

        def up_to(x, ref):
            B, H, W, C = ref.shape
            return jax.image.resize(x, (x.shape[0], H, W, x.shape[-1]),
                                    method="nearest")

        p5 = lat[0](c5)
        p4 = lat[1](c4) + up_to(p5, c4)
        p3 = lat[2](c3) + up_to(p4, c3)
        p2 = lat[3](c2) + up_to(p3, c2)

        def bil_to(x, ref):
            # antialias=False: torch F.interpolate(mode="bilinear") does not
            # antialias on downscale (fpn.py:40-42 resizes p2 down to c3)
            return jax.image.resize(x, (x.shape[0], ref.shape[1], ref.shape[2],
                                        x.shape[-1]), method="bilinear",
                                    antialias=False)

        return jnp.concatenate([bil_to(p2, c3), p3, bil_to(p4, c3), bil_to(p5, c3)],
                               axis=-1)


@dataclasses.dataclass(frozen=True)
class OmniParserConfig(ConfigBase):
    swin_variant: str = "base"
    d_model: int = 512
    nhead: int = 8
    dec_layers: int = 4
    dim_feedforward: int = 2048
    dropout: float = 0.1
    max_position_embeddings: int = 1024
    num_bins: int = 1000
    chars: str = ""                  # default → CoordSeqVocab default charset
    vie_categories: int = 0
    use_char_window_prompt: bool = True
    pt_seq_length: int = 1024
    poly_length: int = 32
    rec_length: int = 25
    max_instances: int = 128
    drop_path_rate: float = 0.2
    # explicit backbone override (None → the named swin_variant); used by
    # tests and non-standard backbones
    swin: object = None

    def vocab(self) -> CoordSeqVocab:
        kw = dict(num_bins=self.num_bins, vie_categories=self.vie_categories)
        if self.chars:
            kw["chars"] = self.chars
        return CoordSeqVocab(**kw)


class DecoderLayer(nn.Module):
    """Pre-norm DETR decoder layer with optional KV caching
    (transformer.py:430 forward_pre)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        p = self.policy
        d = dict(dtype=p.compute_dtype, param_dtype=p.param_dtype)
        self.sa_q = nn.Dense(self.d_model, **d)
        self.sa_k = nn.Dense(self.d_model, **d)
        self.sa_v = nn.Dense(self.d_model, **d)
        self.sa_out = nn.Dense(self.d_model, **d)
        self.ca_q = nn.Dense(self.d_model, **d)
        self.ca_k = nn.Dense(self.d_model, **d)
        self.ca_v = nn.Dense(self.d_model, **d)
        self.ca_out = nn.Dense(self.d_model, **d)
        self.ff1 = nn.Dense(self.dim_feedforward, **d)
        self.ff2 = nn.Dense(self.d_model, **d)
        self.norm1 = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype)
        self.norm2 = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype)
        self.norm3 = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype)

    def _heads(self, x):
        B, T, C = x.shape
        return x.reshape(B, T, self.nhead, C // self.nhead)

    def _attn(self, q, k, v, bias=None):
        """k/v may have batch 1 while q has batch B (shared encoder memory
        for instance-batched decode) — the einsum then broadcasts without
        materializing B copies of K/V."""
        hd = q.shape[-1]
        shared = k.shape[0] == 1 and q.shape[0] != 1
        if shared:
            s = jnp.einsum("bqhd,khd->bhqk", q, k[0]) / (hd ** 0.5)
        else:
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5)
        if bias is not None:
            s = s + bias
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
        if shared:
            o = jnp.einsum("bhqk,khd->bqhd", a, v[0])
        else:
            o = jnp.einsum("bhqk,bkhd->bqhd", a, v)
        B, T = q.shape[0], q.shape[1]
        return o.reshape(B, T, self.d_model)

    def __call__(self, tgt, query_pos, memory, mem_pos, mem_valid,
                 causal: bool = True):
        """Teacher-forced full-sequence pass. tgt [B,T,C]; memory [Bm,S,C]
        (Bm == B or 1, broadcast); mem_valid [Bm,S]."""
        p = self.policy
        B, T, _ = tgt.shape
        h = self.norm1(tgt.astype(jnp.float32)).astype(p.compute_dtype)
        qk_in = h + query_pos
        q, k, v = self._heads(self.sa_q(qk_in)), self._heads(self.sa_k(qk_in)), \
            self._heads(self.sa_v(h))
        bias = None
        if causal:
            cm = jnp.tril(jnp.ones((T, T), bool))
            bias = jnp.where(cm, 0.0, NEG)[None, None]
        tgt = tgt + self.sa_out(self._attn(q, k, v, bias))

        h = self.norm2(tgt.astype(jnp.float32)).astype(p.compute_dtype)
        mem = jnp.broadcast_to(memory, (B, *memory.shape[1:])) \
            if memory.shape[0] == 1 and B != 1 else memory
        mp = jnp.broadcast_to(mem_pos, mem.shape) if mem_pos.shape[0] == 1 and B != 1 else mem_pos
        mv = jnp.broadcast_to(mem_valid, mem.shape[:2]) \
            if mem_valid.shape[0] == 1 and B != 1 else mem_valid
        q = self._heads(self.ca_q(h + query_pos))
        k = self._heads(self.ca_k(mem + mp))
        v = self._heads(self.ca_v(mem))
        bias = jnp.where(mv[:, None, None, :] > 0, 0.0, NEG)
        tgt = tgt + self.ca_out(self._attn(q, k, v, bias))

        h = self.norm3(tgt.astype(jnp.float32)).astype(p.compute_dtype)
        return tgt + self.ff2(nn.relu(self.ff1(h)))

    def prefill(self, tgt, query_pos, mem_k, mem_v, mem_bias, cache_len: int):
        """Causal pass over the prompt that also returns the self-attn cache
        padded to cache_len. Returns (out, (k_cache, v_cache))."""
        p = self.policy
        B, T, _ = tgt.shape
        h = self.norm1(tgt.astype(jnp.float32)).astype(p.compute_dtype)
        qk_in = h + query_pos
        q, k, v = self._heads(self.sa_q(qk_in)), self._heads(self.sa_k(qk_in)), \
            self._heads(self.sa_v(h))
        cm = jnp.tril(jnp.ones((T, T), bool))
        tgt = tgt + self.sa_out(self._attn(q, k, v, jnp.where(cm, 0.0, NEG)[None, None]))

        pad = cache_len - T
        k_cache = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v_cache = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))

        h = self.norm2(tgt.astype(jnp.float32)).astype(p.compute_dtype)
        q = self._heads(self.ca_q(h + query_pos))
        tgt = tgt + self.ca_out(self._attn(q, mem_k, mem_v, mem_bias))

        h = self.norm3(tgt.astype(jnp.float32)).astype(p.compute_dtype)
        out = tgt + self.ff2(nn.relu(self.ff1(h)))
        return out, (k_cache, v_cache)

    def step(self, tgt_t, query_pos_t, caches, pos_idx, mem_k, mem_v, mem_bias):
        """One incremental decode step. tgt_t [B,1,C]; caches (k,v)
        [B,L,H,hd]; pos_idx scalar — current absolute position."""
        p = self.policy
        k_cache, v_cache = caches
        B = tgt_t.shape[0]
        h = self.norm1(tgt_t.astype(jnp.float32)).astype(p.compute_dtype)
        qk_in = h + query_pos_t
        q = self._heads(self.sa_q(qk_in))
        k_t = self._heads(self.sa_k(qk_in))
        v_t = self._heads(self.sa_v(h))
        k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k_t, pos_idx, axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v_t, pos_idx, axis=1)
        L = k_cache.shape[1]
        valid = (jnp.arange(L) <= pos_idx)[None, None, None, :]
        bias = jnp.where(valid, 0.0, NEG)
        tgt_t = tgt_t + self.sa_out(self._attn(q, k_cache, v_cache, bias))

        h = self.norm2(tgt_t.astype(jnp.float32)).astype(p.compute_dtype)
        q = self._heads(self.ca_q(h + query_pos_t))
        tgt_t = tgt_t + self.ca_out(self._attn(q, mem_k, mem_v, mem_bias))

        h = self.norm3(tgt_t.astype(jnp.float32)).astype(p.compute_dtype)
        out = tgt_t + self.ff2(nn.relu(self.ff1(h)))
        return out, (k_cache, v_cache)

    def step_ragged(self, tgt_t, query_pos_t, caches, pos_vec, mem_k, mem_v,
                    mem_bias):
        """Like step, but every batch row sits at its own absolute position
        (pos_vec [B]) — the primitive for cross-request continuous batching,
        where slots in one device batch decode different requests."""
        p = self.policy
        k_cache, v_cache = caches
        B = tgt_t.shape[0]
        h = self.norm1(tgt_t.astype(jnp.float32)).astype(p.compute_dtype)
        qk_in = h + query_pos_t
        q = self._heads(self.sa_q(qk_in))
        k_t = self._heads(self.sa_k(qk_in))
        v_t = self._heads(self.sa_v(h))
        rows = jnp.arange(B)
        k_cache = k_cache.at[rows, pos_vec].set(k_t[:, 0])
        v_cache = v_cache.at[rows, pos_vec].set(v_t[:, 0])
        L = k_cache.shape[1]
        valid = jnp.arange(L)[None] <= pos_vec[:, None]      # [B, L]
        bias = jnp.where(valid[:, None, None, :], 0.0, NEG)
        tgt_t = tgt_t + self.sa_out(self._attn(q, k_cache, v_cache, bias))

        h = self.norm2(tgt_t.astype(jnp.float32)).astype(p.compute_dtype)
        q = self._heads(self.ca_q(h + query_pos_t))
        tgt_t = tgt_t + self.ca_out(self._attn(q, mem_k, mem_v, mem_bias))

        h = self.norm3(tgt_t.astype(jnp.float32)).astype(p.compute_dtype)
        out = tgt_t + self.ff2(nn.relu(self.ff1(h)))
        return out, (k_cache, v_cache)

    def mem_kv(self, memory, mem_pos):
        return self._heads(self.ca_k(memory + mem_pos)), self._heads(self.ca_v(memory))


class SeqDecoder(nn.Module):
    """One task decoder: N pre-norm layers + final norm + 3-layer MLP head
    (transformer.py:340 TransformerDecoder + MLP pred layer)."""

    cfg: OmniParserConfig
    num_classes: int
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        c = self.cfg
        p = self.policy
        self.layers = [DecoderLayer(c.d_model, c.nhead, c.dim_feedforward,
                                    policy=p, name=f"layer_{i}")
                       for i in range(c.dec_layers)]
        self.final_norm = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype)
        d = dict(dtype=p.compute_dtype, param_dtype=p.param_dtype)
        self.head1 = nn.Dense(c.d_model, **d)
        self.head2 = nn.Dense(c.d_model, **d)
        self.head3 = nn.Dense(self.num_classes, **d)

    def _head(self, x):
        h = nn.relu(self.head1(x))
        h = nn.relu(self.head2(h))
        return self.head3(h).astype(jnp.float32)

    def __call__(self, tgt, query_pos, memory, mem_pos, mem_valid):
        for layer in self.layers:
            tgt = layer(tgt, query_pos, memory, mem_pos, mem_valid)
        tgt = self.final_norm(tgt.astype(jnp.float32)).astype(tgt.dtype)
        return self._head(tgt)

    def prefill(self, tgt, query_pos, mem_kvs, mem_bias, cache_len: int):
        caches = []
        for layer, (mk, mv) in zip(self.layers, mem_kvs):
            tgt, cache = layer.prefill(tgt, query_pos, mk, mv, mem_bias, cache_len)
            caches.append(cache)
        tgt = self.final_norm(tgt.astype(jnp.float32)).astype(tgt.dtype)
        return self._head(tgt), tuple(caches)

    def step(self, tgt_t, query_pos_t, caches, pos_idx, mem_kvs, mem_bias):
        new_caches = []
        for layer, cache, (mk, mv) in zip(self.layers, caches, mem_kvs):
            tgt_t, cache = layer.step(tgt_t, query_pos_t, cache, pos_idx, mk, mv,
                                      mem_bias)
            new_caches.append(cache)
        tgt_t = self.final_norm(tgt_t.astype(jnp.float32)).astype(tgt_t.dtype)
        return self._head(tgt_t), tuple(new_caches)

    def step_ragged(self, tgt_t, query_pos_t, caches, pos_vec, mem_kvs,
                    mem_bias):
        """Per-row-position incremental step (see DecoderLayer.step_ragged)."""
        new_caches = []
        for layer, cache, (mk, mv) in zip(self.layers, caches, mem_kvs):
            tgt_t, cache = layer.step_ragged(tgt_t, query_pos_t, cache, pos_vec,
                                             mk, mv, mem_bias)
            new_caches.append(cache)
        tgt_t = self.final_norm(tgt_t.astype(jnp.float32)).astype(tgt_t.dtype)
        return self._head(tgt_t), tuple(new_caches)

    def mem_kvs(self, memory, mem_pos):
        return tuple(layer.mem_kv(memory, mem_pos) for layer in self.layers)


class TokenEmbedding(nn.Module):
    """Shared word embedding + per-task positions + LN
    (transformer.py:283 DecoderEmbeddings)."""

    cfg: OmniParserConfig
    num_classes: int
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        c = self.cfg
        p = self.policy
        self.word = nn.Embed(self.num_classes, c.d_model, param_dtype=p.param_dtype)
        self.pos = {
            t: nn.Embed(c.max_position_embeddings, c.d_model,
                        param_dtype=p.param_dtype, name=f"{t}_pos")
            for t in ("pt", "poly", "rec")
        }
        self.ln = nn.LayerNorm(dtype=jnp.float32, param_dtype=p.param_dtype)

    def __call__(self, ids, task: str, pos_offset=0):
        """ids [B,T] → (embeddings [B,T,C], query_pos [B,T,C])."""
        T = ids.shape[1]
        positions = jnp.arange(T) + pos_offset
        pe = self.pos[task](positions)[None]
        we = self.word(ids)
        emb = self.ln((we + pe).astype(jnp.float32)).astype(we.dtype)
        return emb, jnp.broadcast_to(pe, emb.shape).astype(emb.dtype)

    def embed_at(self, ids_t, task: str, positions):
        """Single-token embed with a per-row position (ids_t [B,1],
        positions [B]) for ragged continuous decode."""
        pe = self.pos[task](positions)[:, None]          # [B,1,C]
        we = self.word(ids_t)
        emb = self.ln((we + pe).astype(jnp.float32)).astype(we.dtype)
        return emb, pe.astype(emb.dtype)


@MODELS.register("omniparser")
class OmniParser(nn.Module):
    config: OmniParserConfig = OmniParserConfig()
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        c = self.config
        p = self.policy
        self.vocab_layout = c.vocab()
        nc = self.vocab_layout.num_classes
        swin_cfg = (c.swin if c.swin is not None else
                    SWIN_VARIANTS[c.swin_variant].replace(
                        drop_path_rate=c.drop_path_rate))
        self.backbone = SwinTransformer(swin_cfg, policy=p)
        self.fpn = FPN(256, policy=p)
        self.input_proj = nn.Conv(c.d_model, (1, 1), strides=(2, 2),
                                  dtype=p.compute_dtype, param_dtype=p.param_dtype)
        self.embedding = TokenEmbedding(c, nc, policy=p)
        self.pt_decoder = SeqDecoder(c, nc, policy=p)
        self.poly_decoder = SeqDecoder(c, nc, policy=p)
        self.rec_decoder = SeqDecoder(c, nc, policy=p)

    def encode(self, images, mask=None):
        """→ (memory [B,S,C], mem_pos [B,S,C], mem_valid [B,S])."""
        feats, masks = self.backbone(images, mask)
        src = self.fpn(feats)                       # c3 scale, 1024ch
        src = self.input_proj(src)                  # stride 2 → c4 scale
        fmask = masks[1][:, ::2, ::2]               # c3/2 == c4 scale
        fmask = fmask[:, :src.shape[1], :src.shape[2]]
        pos = sine_position_embedding(fmask, self.config.d_model)
        B, H, W, C = src.shape
        return (src.reshape(B, H * W, C),
                pos.reshape(B, H * W, C).astype(src.dtype),
                fmask.reshape(B, H * W))

    def __call__(self, images, input_seqs: Dict[str, jnp.ndarray], mask=None
                 ) -> Dict[str, jnp.ndarray]:
        """Teacher-forced training forward. input_seqs: {"pt" [B,Tp],
        "poly" [B,Ty], "rec" [B,Tr]} → logits dict."""
        memory, mem_pos, mem_valid = self.encode(images, mask)
        out = {}
        for task, dec in (("pt", self.pt_decoder), ("poly", self.poly_decoder),
                          ("rec", self.rec_decoder)):
            emb, qpos = self.embedding(input_seqs[task], task)
            out[task] = dec(emb, qpos, memory, mem_pos, mem_valid)
        return out

    # ----- greedy KV-cached decode (eval) -----

    def _greedy(self, dec, task: str, prompt_ids, memory, mem_pos, mem_valid,
                steps: int, mask_fn, eos_id: Optional[int] = None):
        """prompt_ids [B,P]; mask_fn(step_i, logits) → masked logits.
        Returns (tokens [B,steps], probs [B,steps], finished_before [B,steps]).

        With an eos_id the decode runs under `lax.while_loop` and exits as
        soon as every sequence has emitted EOS (the reference breaks its
        Python loop at EOS, transformer.py:115-129; a scan would always pay
        all `steps` sequential ticks — 1024 for the pt stage — regardless of
        how many instances the page actually has). Unexecuted steps keep the
        buffer defaults: token = padding_index, finished_before = True,
        prob = 0 (scan would carry an unused junk prob there; nothing
        consumes probs at finished steps)."""
        c = self.config
        B, P = prompt_ids.shape
        cache_len = P + steps
        mem_kvs = dec.mem_kvs(memory, mem_pos)
        # memory batch may be 1 while B = max_instances — _attn broadcasts
        mem_bias = jnp.where(mem_valid[:, None, None, :] > 0, 0.0, NEG)

        emb, qpos = self.embedding(prompt_ids, task)
        logits, caches = dec.prefill(emb, qpos, mem_kvs, mem_bias, cache_len)
        last_logits = logits[:, -1]

        def body(carry, i):
            last_logits, caches, prev_tok, finished = carry
            ml = mask_fn(i, last_logits)
            tok = jnp.argmax(ml, axis=-1).astype(jnp.int32)
            prob = jax.nn.softmax(ml, axis=-1)
            tokp = jnp.take_along_axis(prob, tok[:, None], axis=1)[:, 0]
            was_finished = finished
            if eos_id is not None:
                finished = finished | (tok == eos_id)
            out_tok = jnp.where(was_finished, self.vocab_layout.padding_index, tok)

            emb_t, qpos_t = self.embedding(out_tok[:, None], task, pos_offset=P + i)
            new_logits, caches = dec.step(emb_t, qpos_t, caches, P + i,
                                          mem_kvs, mem_bias)
            return (new_logits[:, 0], caches, out_tok, finished), \
                (out_tok, tokp, was_finished)

        finished0 = jnp.zeros((B,), bool)
        carry0 = (last_logits, caches, prompt_ids[:, -1], finished0)

        if eos_id is None:
            _, (toks, probs, fin) = jax.lax.scan(body, carry0, jnp.arange(steps))
            return toks.T, probs.T, fin.T  # [B, steps]

        toks0 = jnp.full((steps, B), self.vocab_layout.padding_index, jnp.int32)
        probs0 = jnp.zeros((steps, B), last_logits.dtype)
        fin0 = jnp.ones((steps, B), bool)

        def cond(state):
            i, carry = state[0], state[1]
            return (i < steps) & ~jnp.all(carry[3])

        def wbody(state):
            i, carry, toks, probs, fin = state
            carry, (out_tok, tokp, was_fin) = body(carry, i)
            toks = jax.lax.dynamic_update_index_in_dim(toks, out_tok, i, 0)
            probs = jax.lax.dynamic_update_index_in_dim(probs, tokp, i, 0)
            fin = jax.lax.dynamic_update_index_in_dim(fin, was_fin, i, 0)
            return (i + 1, carry, toks, probs, fin)

        _, _, toks, probs, fin = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), carry0, toks0, probs0, fin0))
        return toks.T, probs.T, fin.T  # [B, steps]

    def infer_spotting(self, images, mask=None) -> Dict[str, jnp.ndarray]:
        """Full spotting inference (B=1): pt seq → per-point polygons + recs.
        Returns fixed-shape arrays + validity masks (host detokenizes)."""
        c = self.config
        v = self.vocab_layout
        memory, mem_pos, mem_valid = self.encode(images, mask)

        prompt = jnp.asarray(v.pt_prompt(c.use_char_window_prompt))[None]

        def pt_mask(i, logits):
            ids = jnp.arange(logits.shape[-1])
            coord = ids < c.num_bins
            eos = ids == v.pt_eos_index
            allow = jnp.where(i % 2 == 0, coord | eos, coord)
            return jnp.where(allow[None], logits, NEG)

        pt_toks, pt_probs, pt_fin = self._greedy(
            self.pt_decoder, "pt", prompt, memory, mem_pos, mem_valid,
            c.pt_seq_length, pt_mask, eos_id=v.pt_eos_index)

        # points: pairs of coordinate tokens before EOS
        valid_tok = (~pt_fin[0]) & (pt_toks[0] != v.pt_eos_index)
        n_tok = jnp.sum(valid_tok.astype(jnp.int32))
        n_pts = jnp.minimum(n_tok // 2, c.max_instances)
        pairs = jnp.zeros((c.max_instances, 2), jnp.int32)
        idx = jnp.arange(c.max_instances)
        px = jnp.where(idx < n_pts, pt_toks[0, idx * 2], 0)
        py = jnp.where(idx < n_pts, pt_toks[0, idx * 2 + 1], 0)
        pairs = jnp.stack([px, py], axis=1)
        inst_valid = idx < n_pts

        poly, rec = self._decode_poly_rec(pairs, memory, mem_pos, mem_valid)
        return {
            "pt_tokens": pt_toks, "pt_valid": valid_tok[None],
            "points": pairs[None], "instance_valid": inst_valid[None],
            "polygons": poly[0][None], "poly_probs": poly[1][None],
            "rec_tokens": rec[0][None], "rec_probs": rec[1][None],
        }

    def _decode_poly_rec(self, pairs, memory, mem_pos, mem_valid):
        """Per-point polygon + content decode, batched over max_instances
        (the reference loops per point, transformer.py:153-190; here all
        instances share one KV-cached scan). pairs [N,2] bin tokens."""
        c = self.config
        v = self.vocab_layout

        # polygon decode (prompt = [x, y, poly_sos]); the VIE branch's
        # logits[:-vie_categories] slice is subsumed by the bins-only mask
        sos = jnp.full((c.max_instances, 1), v.poly_sos_index, jnp.int32)
        poly_prompt = jnp.concatenate([pairs, sos], axis=1)

        def poly_mask(i, logits):
            ids = jnp.arange(logits.shape[-1])
            return jnp.where((ids < c.num_bins)[None], logits, NEG)

        poly_toks, poly_probs, _ = self._greedy(
            self.poly_decoder, "poly", poly_prompt, memory, mem_pos, mem_valid,
            c.poly_length, poly_mask)

        # rec decode (prompt = [x, y, rec_sos]); `ids <= rec_eos_index`
        # also excludes the trailing VIE category tokens
        sos = jnp.full((c.max_instances, 1), v.rec_sos_index, jnp.int32)
        rec_prompt = jnp.concatenate([pairs, sos], axis=1)

        def rec_mask(i, logits):
            ids = jnp.arange(logits.shape[-1])
            allow = ((ids >= c.num_bins) & (ids <= v.rec_eos_index)
                     & (ids != v.pt_eos_index) & (ids != v.poly_eos_index))
            return jnp.where(allow[None], logits, NEG)

        rec_toks, rec_probs, _ = self._greedy(
            self.rec_decoder, "rec", rec_prompt, memory, mem_pos, mem_valid,
            c.rec_length, rec_mask)

        return (poly_toks, poly_probs), (rec_toks, rec_probs)

    def infer_vie(self, images, mask=None) -> Dict[str, jnp.ndarray]:
        """KIE/VIE inference (B=1). The pt decode emits strict
        (x, y, class) triplets — the reference's period-3 masking
        (transformer.py:116-124: step%3==0 coordinate-or-EOS, ==1
        coordinate, ==2 one of the trailing vie_categories class tokens) —
        then every point gets a batched polygon + content decode
        (decode_vie_pt_poly_rec_seq, transformer.py:143-215). Returns
        fixed-shape arrays; `eval.spotting_eval.decode_vie_outputs`
        assembles host-side entities."""
        c = self.config
        v = self.vocab_layout
        if c.vie_categories <= 0:
            raise ValueError("infer_vie requires vie_categories > 0")
        cls_base = v.num_classes - c.vie_categories
        memory, mem_pos, mem_valid = self.encode(images, mask)

        prompt = jnp.asarray(v.pt_prompt(c.use_char_window_prompt))[None]

        def pt_mask(i, logits):
            ids = jnp.arange(logits.shape[-1])
            coord = ids < c.num_bins
            eos = ids == v.pt_eos_index
            cls = ids >= cls_base
            allow = jnp.where(i % 3 == 0, coord | eos,
                              jnp.where(i % 3 == 1, coord, cls))
            return jnp.where(allow[None], logits, NEG)

        pt_toks, pt_probs, pt_fin = self._greedy(
            self.pt_decoder, "pt", prompt, memory, mem_pos, mem_valid,
            c.pt_seq_length, pt_mask, eos_id=v.pt_eos_index)

        # triplets (x, y, class) before EOS; masking guarantees the layout
        valid_tok = (~pt_fin[0]) & (pt_toks[0] != v.pt_eos_index)
        n_tok = jnp.sum(valid_tok.astype(jnp.int32))
        n_inst = jnp.minimum(n_tok // 3, c.max_instances)
        idx = jnp.arange(c.max_instances)
        last = c.pt_seq_length - 1
        px = jnp.where(idx < n_inst,
                       pt_toks[0, jnp.minimum(idx * 3, last)], 0)
        py = jnp.where(idx < n_inst,
                       pt_toks[0, jnp.minimum(idx * 3 + 1, last)], 0)
        cls = jnp.where(idx < n_inst,
                        pt_toks[0, jnp.minimum(idx * 3 + 2, last)], cls_base)
        cls_prob = jnp.where(idx < n_inst,
                             pt_probs[0, jnp.minimum(idx * 3 + 2, last)], 0.0)
        pairs = jnp.stack([px, py], axis=1)
        inst_valid = idx < n_inst

        poly, rec = self._decode_poly_rec(pairs, memory, mem_pos, mem_valid)
        return {
            "pt_tokens": pt_toks, "pt_valid": valid_tok[None],
            "points": pairs[None], "instance_valid": inst_valid[None],
            "classes": cls[None], "class_probs": cls_prob[None],
            "polygons": poly[0][None], "poly_probs": poly[1][None],
            "rec_tokens": rec[0][None], "rec_probs": rec[1][None],
        }


def omniparser_loss(outputs: Dict[str, jnp.ndarray],
                    targets: Dict[str, jnp.ndarray],
                    padding_index: int,
                    weights: Tuple[float, float, float] = (1.0, 1.0, 2.0)
                    ) -> Dict[str, jnp.ndarray]:
    """Teacher-forced CE, padding ignored, task-weighted
    (engine/train.py:33-41; rec weight 2 per train.sh)."""
    from advancedliteratemachinery_tpu.engine.train import cross_entropy_ignore_pad

    losses = {}
    total = 0.0
    for task, w in zip(("pt", "poly", "rec"), weights):
        loss = cross_entropy_ignore_pad(outputs[task], targets[task],
                                        ignore_id=padding_index)
        losses[f"{task}_loss"] = loss
        total = total + w * loss
    losses["loss"] = total
    return losses
