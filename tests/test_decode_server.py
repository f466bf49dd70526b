"""Cross-request continuous batching (SpottingDecodeServer): slot-based
ragged decode must produce exactly the tokens of an independent sequential
KV-cached decode per request, regardless of arrival order and interleaving.
Also covers SeqDecoder.step_ragged == per-row scalar step equivalence."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.serving import SpottingDecodeServer
from advancedliteratemachinery_tpu.models.omniparser import (
    OmniParser, OmniParserConfig)

CFG = OmniParserConfig(swin_variant="tiny", d_model=32, nhead=2,
                       dim_feedforward=64, dec_layers=2,
                       max_position_embeddings=64)
S_MEM = 6
EOS = 1
PAD = 0


@pytest.fixture(scope="module")
def setup():
    model = OmniParser(CFG, policy=FP32_POLICY)
    rng = np.random.default_rng(0)
    # init params via the training path (creates all decoders + embedding)
    imgs = jnp.zeros((1, 32, 32, 3))
    seqs = {t: jnp.zeros((1, 4), jnp.int32) for t in ("pt", "poly", "rec")}
    params = model.init(jax.random.PRNGKey(0), imgs, seqs)["params"]
    nc = CFG.vocab().num_classes

    def make_request(seed):
        r = np.random.default_rng(seed)
        memory = r.standard_normal((S_MEM, CFG.d_model)).astype(np.float32)
        mem_pos = r.standard_normal((S_MEM, CFG.d_model)).astype(np.float32)
        mem_valid = np.ones((S_MEM,), np.float32)
        prompt = r.integers(2, nc, (3,)).astype(np.int32)
        return memory, mem_pos, mem_valid, prompt

    return model, params, make_request, nc


def reference_decode(model, params, req, max_steps):
    """Sequential single-request greedy decode via prefill + scalar step."""
    memory, mem_pos, mem_valid, prompt = req
    P = prompt.shape[0]
    cache_len = P + max_steps + 1

    def run(m):
        dec = m.rec_decoder
        mem_kvs = dec.mem_kvs(jnp.asarray(memory)[None],
                              jnp.asarray(mem_pos)[None])
        mem_bias = jnp.where(jnp.asarray(mem_valid)[None][:, None, None, :] > 0,
                             0.0, -1e9)
        emb, qpos = m.embedding(jnp.asarray(prompt)[None], "rec")
        logits, caches = dec.prefill(emb, qpos, mem_kvs, mem_bias, cache_len)
        last = logits[:, -1]
        toks = []
        for i in range(max_steps):
            tok = int(jnp.argmax(last[0]))
            if tok == EOS:
                break
            toks.append(tok)
            emb_t, qpos_t = m.embedding(jnp.full((1, 1), tok, jnp.int32),
                                        "rec", pos_offset=P + i)
            last, caches = dec.step(emb_t, qpos_t, caches, P + i, mem_kvs,
                                    mem_bias)
            last = last[:, 0]
        return toks

    return model.apply({"params": params}, method=run)


class TestDecodeServer:
    def test_matches_sequential_decode_with_staggered_arrivals(self, setup):
        model, params, make_request, nc = setup
        max_steps = 10
        reqs = [make_request(s) for s in (1, 2, 3, 4, 5)]
        expected = [reference_decode(model, params, r, max_steps)
                    for r in reqs]
        # at least one request should decode a non-trivial sequence
        assert any(len(e) > 0 for e in expected)

        server = SpottingDecodeServer(model, params, task="rec", n_slots=2,
                                      max_steps=max_steps, eos_id=EOS,
                                      pad_id=PAD).start()
        try:
            futs = []
            for i, r in enumerate(reqs):
                futs.append(server.submit(*r))
                if i == 2:
                    time.sleep(0.05)   # stagger arrivals mid-decode
            results = [f.result(timeout=120) for f in futs]
        finally:
            server.stop()
        for got, want in zip(results, expected):
            assert got == want, (got, want)
        assert server.stats["requests"] == 5
        # 2 slots, 5 requests → slots must have been reused
        assert server.stats["ticks"] >= max(len(e) for e in expected)

    @pytest.mark.parametrize("burst", [3, 8])
    def test_burst_ticks_match_sequential_decode(self, setup, burst):
        """burst_ticks > 1 (r5: lax.scan ticks per dispatch, one host
        round trip per T tokens) must not change a single token vs the
        sequential oracle — including bursts that do not divide the
        sequence lengths and slot reuse between bursts."""
        model, params, make_request, nc = setup
        max_steps = 10
        reqs = [make_request(s) for s in (1, 2, 3, 4, 5)]
        expected = [reference_decode(model, params, r, max_steps)
                    for r in reqs]
        server = SpottingDecodeServer(model, params, task="rec", n_slots=2,
                                      max_steps=max_steps, eos_id=EOS,
                                      pad_id=PAD, burst_ticks=burst).start()
        try:
            futs = []
            for i, r in enumerate(reqs):
                futs.append(server.submit(*r))
                if i == 2:
                    time.sleep(0.05)
            results = [f.result(timeout=120) for f in futs]
        finally:
            server.stop()
        for got, want in zip(results, expected):
            assert got == want, (got, want)
        assert server.stats["requests"] == 5

    def test_mixed_shapes_served_via_bucketing(self, setup):
        """Requests with different (prompt_len, mem_len) — real document
        batches have varying page sizes — decode identically to the
        per-request sequential oracle when the server is built with shape
        budgets (zero-padded memory + fixed cache length)."""
        model, params, _, nc = setup
        max_steps = 8

        def make_sized(seed, s, plen):
            r = np.random.default_rng(seed)
            memory = r.standard_normal((s, CFG.d_model)).astype(np.float32)
            mem_pos = r.standard_normal((s, CFG.d_model)).astype(np.float32)
            mem_valid = np.ones((s,), np.float32)
            prompt = r.integers(2, nc, (plen,)).astype(np.int32)
            return memory, mem_pos, mem_valid, prompt

        reqs = [make_sized(11, 6, 3), make_sized(12, 4, 3),
                make_sized(13, 6, 2), make_sized(14, 3, 1)]
        expected = [reference_decode(model, params, r, max_steps)
                    for r in reqs]
        assert any(len(e) > 0 for e in expected)

        server = SpottingDecodeServer(model, params, task="rec", n_slots=2,
                                      max_steps=max_steps, eos_id=EOS,
                                      pad_id=PAD, mem_len=6,
                                      max_prompt_len=3).start()
        try:
            futs = [server.submit(*r) for r in reqs]
            results = [f.result(timeout=120) for f in futs]
            # over-budget requests get a clear error, not a crash
            with pytest.raises(ValueError, match="exceeds the server budget"):
                server.submit(*make_sized(15, 9, 3)).result(timeout=30)
        finally:
            server.stop()
        for got, want in zip(results, expected):
            assert got == want, (got, want)

    def test_step_ragged_equals_scalar_step(self, setup):
        model, params, make_request, nc = setup
        memory, mem_pos, mem_valid, prompt = make_request(7)
        P = prompt.shape[0]
        cache_len = P + 6

        def run(m):
            dec = m.rec_decoder
            B = 3
            mem_kvs = dec.mem_kvs(jnp.tile(jnp.asarray(memory)[None], (B, 1, 1)),
                                  jnp.tile(jnp.asarray(mem_pos)[None], (B, 1, 1)))
            mem_bias = jnp.zeros((B, 1, 1, S_MEM))
            emb, qpos = m.embedding(jnp.tile(jnp.asarray(prompt)[None], (B, 1)),
                                    "rec")
            _, caches = dec.prefill(emb, qpos, mem_kvs, mem_bias, cache_len)
            tok = jnp.asarray([[2], [3], [4]], jnp.int32)
            # scalar step at the shared position P
            emb_t, qpos_t = m.embedding(tok, "rec", pos_offset=P)
            ref, _ = dec.step(emb_t, qpos_t, caches, P, mem_kvs, mem_bias)
            # ragged step with every row at position P
            emb_r, qpos_r = m.embedding.embed_at(tok, "rec",
                                                 jnp.full((3,), P, jnp.int32))
            rag, _ = dec.step_ragged(emb_r, qpos_r, caches,
                                     jnp.full((3,), P, jnp.int32),
                                     mem_kvs, mem_bias)
            return ref, rag

        ref, rag = model.apply({"params": params}, method=run)
        np.testing.assert_allclose(np.asarray(rag), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
