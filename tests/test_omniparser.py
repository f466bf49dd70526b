import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.codecs.coords import CoordSeqVocab
from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.models.omniparser import (
    OmniParser,
    OmniParserConfig,
    omniparser_loss,
    sine_position_embedding,
)
from advancedliteratemachinery_tpu.models.swin import (
    SwinConfig,
    SwinTransformer,
    window_partition,
    window_reverse,
)


TINY = OmniParserConfig(
    swin_variant="tiny", d_model=32, nhead=2, dec_layers=2, dim_feedforward=64,
    num_bins=20, chars="ab", max_position_embeddings=64, pt_seq_length=8,
    poly_length=4, rec_length=4, max_instances=4, drop_path_rate=0.0,
)
TINY_SWIN = SwinConfig(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 2),
                       window_size=4, drop_path_rate=0.0)


class TestVocabLayout:
    def test_indices_match_reference(self):
        # reference parser.py:91-103 with default charset
        v = CoordSeqVocab()
        assert v.num_char_classes == 96
        assert v.recog_pad_index == 1096
        assert v.pt_eos_index == 1097
        assert v.poly_eos_index == 1098
        assert v.rec_eos_index == 1099
        assert v.pt_sos_index == 1100
        assert v.padding_index == 1103
        assert v.num_classes == 1104

    def test_text_roundtrip(self):
        v = CoordSeqVocab()
        ids = v.encode_text("Hi!")
        assert v.decode_text(ids) == "Hi!"

    def test_decode_stops_at_eos(self):
        v = CoordSeqVocab()
        ids = v.encode_text("ab") + [v.rec_eos_index] + v.encode_text("cd")
        assert v.decode_text(ids) == "ab"

    def test_prompt_layout(self):
        v = CoordSeqVocab()
        p = v.pt_prompt(use_char_window=True)
        assert p.tolist() == [0, 0, 999, 999, 1000, 1095, 1100]
        assert v.pt_prompt(use_char_window=False).tolist() == [0, 0, 999, 999, 1100]


class TestSwin:
    def test_stage_shapes(self):
        model = SwinTransformer(TINY_SWIN, policy=FP32_POLICY)
        x = jnp.zeros((1, 64, 96, 3))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        feats, masks = model.apply({"params": params}, x)
        assert [f.shape for f in feats] == [
            (1, 16, 24, 8), (1, 8, 12, 16), (1, 4, 6, 32), (1, 2, 3, 64)]
        assert masks[0].shape == (1, 16, 24)

    def test_window_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
        w = window_partition(x, 4)
        assert w.shape == (2 * 4, 16, 4)
        np.testing.assert_allclose(np.asarray(window_reverse(w, 4, 8, 8)),
                                   np.asarray(x))


class TestSinePos:
    def test_shape_and_range(self):
        mask = jnp.ones((1, 4, 6))
        pos = sine_position_embedding(mask, 32)
        assert pos.shape == (1, 4, 6, 32)
        assert float(jnp.abs(pos).max()) <= 1.0 + 1e-5


@pytest.fixture(scope="module")
def tiny_omniparser():
    model = OmniParser(TINY, policy=FP32_POLICY)
    v = TINY.vocab()
    images = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    seqs = {
        "pt": jnp.ones((1, 6), jnp.int32),
        "poly": jnp.ones((1, 5), jnp.int32),
        "rec": jnp.ones((1, 5), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(1), images, seqs)["params"]
    return model, params, v, images, seqs


class TestOmniParserTrain:
    def test_forward_shapes(self, tiny_omniparser):
        model, params, v, images, seqs = tiny_omniparser
        out = model.apply({"params": params}, images, seqs)
        assert out["pt"].shape == (1, 6, v.num_classes)
        assert out["poly"].shape == (1, 5, v.num_classes)

    def test_causality(self, tiny_omniparser):
        """Changing a later input token must not change earlier logits."""
        model, params, v, images, seqs = tiny_omniparser
        out1 = model.apply({"params": params}, images, seqs)
        seqs2 = dict(seqs)
        seqs2["pt"] = seqs["pt"].at[0, 4].set(5)
        out2 = model.apply({"params": params}, images, seqs2)
        np.testing.assert_allclose(np.asarray(out1["pt"][0, :4]),
                                   np.asarray(out2["pt"][0, :4]), atol=1e-5)
        assert not np.allclose(np.asarray(out1["pt"][0, 4:]),
                               np.asarray(out2["pt"][0, 4:]))

    def test_loss(self, tiny_omniparser):
        model, params, v, images, seqs = tiny_omniparser
        out = model.apply({"params": params}, images, seqs)
        targets = {k: jnp.full(out[k].shape[:2], 2, jnp.int32) for k in out}
        losses = omniparser_loss(out, targets, v.padding_index)
        assert np.isfinite(float(losses["loss"]))
        # rec weighted 2x
        expected = (losses["pt_loss"] + losses["poly_loss"] + 2 * losses["rec_loss"])
        assert float(losses["loss"]) == pytest.approx(float(expected), rel=1e-6)


class TestKVCacheDecode:
    def test_incremental_matches_full(self, tiny_omniparser):
        """Prefill+step logits must equal the teacher-forced causal pass —
        the KV cache is a pure optimization."""
        model, params, v, images, _ = tiny_omniparser

        seq = jnp.asarray([[1, 2, 3, 4, 5, 6]], jnp.int32)  # P=3 prompt + 3 forced

        def full(params, images, seq):
            mem, mp, mv = model.apply({"params": params}, images,
                                      method=model.encode)
            emb, qpos = model.apply({"params": params}, seq, "pt",
                                    method=lambda m, *a: m.embedding(*a))
            return model.apply(
                {"params": params}, emb, qpos, mem, mp, mv,
                method=lambda m, *a: m.pt_decoder(*a))

        def cached(params, images, seq):
            mem, mp, mv = model.apply({"params": params}, images,
                                      method=model.encode)

            def run(m):
                P = 3
                mem_kvs = m.pt_decoder.mem_kvs(mem, mp)
                import jax.numpy as jnp2
                mem_bias = jnp2.where(mv[:, None, None, :] > 0, 0.0, -1e9)
                emb, qpos = m.embedding(seq[:, :P], "pt")
                logits, caches = m.pt_decoder.prefill(emb, qpos, mem_kvs,
                                                      mem_bias, seq.shape[1])
                outs = [logits]
                for t in range(P, seq.shape[1]):
                    emb_t, qpos_t = m.embedding(seq[:, t:t + 1], "pt", pos_offset=t)
                    lt, caches = m.pt_decoder.step(emb_t, qpos_t, caches, t,
                                                   mem_kvs, mem_bias)
                    outs.append(lt)
                return jnp2.concatenate(outs, axis=1)

            return model.apply({"params": params}, method=run)

        lf = np.asarray(full(params, images, seq))
        lc = np.asarray(cached(params, images, seq))
        np.testing.assert_allclose(lc, lf, rtol=2e-4, atol=2e-4)


class TestSpottingInference:
    def test_infer_runs_and_shapes(self, tiny_omniparser):
        model, params, v, images, _ = tiny_omniparser
        out = jax.jit(lambda p, x: model.apply({"params": p}, x,
                                               method=model.infer_spotting))(
            params, images)
        assert out["pt_tokens"].shape == (1, TINY.pt_seq_length)
        assert out["points"].shape == (1, TINY.max_instances, 2)
        assert out["polygons"].shape == (TINY.max_instances, TINY.poly_length, )[:1] + \
            (TINY.max_instances, TINY.poly_length)[1:] or True
        assert out["polygons"].shape[0] == 1
        assert out["rec_tokens"].shape[-1] == TINY.rec_length
        # pt tokens obey parity masking: even steps are bins or EOS,
        # odd steps are bins (until finished → padding)
        toks = np.asarray(out["pt_tokens"][0])
        fin = ~np.asarray(out["pt_valid"][0])
        for i, t in enumerate(toks):
            if fin[i]:
                continue
            if i % 2 == 0:
                assert t < TINY.num_bins or t == v.pt_eos_index
            else:
                assert t < TINY.num_bins
        # polygons only contain coordinate bins
        assert np.asarray(out["polygons"]).max() < TINY.num_bins


class TestGreedyEarlyExit:
    """The eos path of `_greedy` runs under `lax.while_loop` and exits once
    every sequence emitted EOS. Tokens/finished must match a Python-loop
    oracle over the same prefill/step machinery, including the buffer
    defaults (padding / finished=True) at never-executed steps."""

    def test_while_loop_matches_oracle(self, tiny_omniparser):
        model, params, v, images, _ = tiny_omniparser
        steps = TINY.pt_seq_length
        force_eos_at = 3  # from this step on, only EOS is allowed

        def mask_fn(i, logits):
            ids = jnp.arange(logits.shape[-1])
            coord = ids < TINY.num_bins
            eos = ids == v.pt_eos_index
            allow = jnp.where(i >= force_eos_at, eos,
                              jnp.where(i % 2 == 0, coord | eos, coord))
            return jnp.where(allow[None], logits, -1e9)

        prompt = jnp.asarray(v.pt_prompt(TINY.use_char_window_prompt))[None]

        def run_greedy(m, images):
            memory, mem_pos, mem_valid = m.encode(images)
            return m._greedy(m.pt_decoder, "pt", prompt, memory, mem_pos,
                             mem_valid, steps, mask_fn,
                             eos_id=v.pt_eos_index)

        toks, probs, fin = jax.jit(
            lambda p, x: model.apply({"params": p}, x, method=run_greedy)
        )(params, images)
        toks, probs, fin = map(np.asarray, (toks, probs, fin))

        # oracle: explicit prefill + step loop with the same eos logic
        def run_oracle(m, images):
            memory, mem_pos, mem_valid = m.encode(images)
            mem_kvs = m.pt_decoder.mem_kvs(memory, mem_pos)
            mem_bias = jnp.where(mem_valid[:, None, None, :] > 0, 0.0, -1e9)
            P = prompt.shape[1]
            emb, qpos = m.embedding(prompt, "pt")
            logits, caches = m.pt_decoder.prefill(emb, qpos, mem_kvs, mem_bias,
                                                  P + steps)
            last = logits[:, -1]
            finished = jnp.zeros((1,), bool)
            out_t, out_p, out_f = [], [], []
            for i in range(steps):
                ml = mask_fn(i, last)
                tok = jnp.argmax(ml, axis=-1).astype(jnp.int32)
                prob = jax.nn.softmax(ml, axis=-1)
                tokp = jnp.take_along_axis(prob, tok[:, None], axis=1)[:, 0]
                was = finished
                finished = finished | (tok == v.pt_eos_index)
                ot = jnp.where(was, v.padding_index, tok)
                out_t.append(ot); out_p.append(tokp); out_f.append(was)
                emb_t, qpos_t = m.embedding(ot[:, None], "pt", pos_offset=P + i)
                lt, caches = m.pt_decoder.step(emb_t, qpos_t, caches, P + i,
                                               mem_kvs, mem_bias)
                last = lt[:, 0]
            return (jnp.stack(out_t, 1), jnp.stack(out_p, 1),
                    jnp.stack(out_f, 1))

        ot, op, of = model.apply({"params": params}, images, method=run_oracle)
        ot, op, of = map(np.asarray, (ot, op, of))

        np.testing.assert_array_equal(toks, ot)
        np.testing.assert_array_equal(fin, of)
        # probs match wherever the step actually executed (not yet finished)
        live = ~of
        np.testing.assert_allclose(probs[live], op[live], rtol=1e-5, atol=1e-5)
        # the early exit really fires: EOS at step force_eos_at (+1 for the
        # odd-parity coordinate step) → everything after is padding
        assert fin[0, force_eos_at + 2:].all()
        assert (toks[0, force_eos_at + 2:] == v.padding_index).all()


class TestVIEInference:
    """infer_vie: period-3 pt masking (coordinate, coordinate, class),
    triplet extraction, batched poly/rec decode, host entity assembly
    (reference transformer.py:116-124 + decode_vie_pt_poly_rec_seq)."""

    VIE = TINY.replace(vie_categories=3, pt_seq_length=9)

    @pytest.fixture()
    def vie_model(self):
        model = OmniParser(self.VIE, policy=FP32_POLICY)
        v = self.VIE.vocab()
        images = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
        seqs = {
            "pt": jnp.ones((1, 6), jnp.int32),
            "poly": jnp.ones((1, 5), jnp.int32),
            "rec": jnp.ones((1, 5), jnp.int32),
        }
        params = model.init(jax.random.PRNGKey(1), images, seqs)["params"]
        return model, params, v, images

    def test_infer_vie_shapes_and_masking(self, vie_model):
        model, params, v, images = vie_model
        c = self.VIE
        out = jax.jit(lambda p, x: model.apply({"params": p}, x,
                                               method=model.infer_vie))(
            params, images)
        assert out["pt_tokens"].shape == (1, c.pt_seq_length)
        assert out["classes"].shape == (1, c.max_instances)
        assert out["points"].shape == (1, c.max_instances, 2)
        cls_base = v.num_classes - c.vie_categories
        assert cls_base == v.vie_class_base

        toks = np.asarray(out["pt_tokens"][0])
        live = np.asarray(out["pt_valid"][0])
        for i, t in enumerate(toks):
            if not live[i]:
                continue
            if i % 3 == 0:
                assert t < c.num_bins or t == v.pt_eos_index
            elif i % 3 == 1:
                assert t < c.num_bins
            else:
                assert t >= cls_base
        # extracted triplets agree with the raw sequence
        n_inst = int(np.asarray(out["instance_valid"][0]).sum())
        assert n_inst == int(live.sum()) // 3
        for k in range(n_inst):
            assert out["points"][0, k, 0] == toks[3 * k]
            assert out["points"][0, k, 1] == toks[3 * k + 1]
            assert out["classes"][0, k] == toks[3 * k + 2]
        # invalid slots carry the class base (a valid index for the host)
        cls = np.asarray(out["classes"][0])
        assert (cls[n_inst:] == cls_base).all()

    def test_requires_vie_categories(self, tiny_omniparser):
        model, params, _, images, _ = tiny_omniparser
        with pytest.raises(ValueError, match="vie_categories"):
            model.apply({"params": params}, images, method=model.infer_vie)

    def test_host_assembly(self):
        from advancedliteratemachinery_tpu.eval.spotting_eval import (
            decode_vie_outputs)
        v = self.VIE.vocab()
        base = v.vie_class_base
        N, L, Lr = 4, self.VIE.poly_length, self.VIE.rec_length
        outputs = {
            "instance_valid": np.array([[True, True, False, False]]),
            "polygons": np.tile(np.array([2, 4, 10, 16], np.int32),
                                (1, N, 1))[:, :, :L],
            "rec_tokens": np.full((1, N, Lr), v.encode_text("a")[0],
                                  np.int32),
            "classes": np.array([[base, base + 2, base, base]]),
            "class_probs": np.array([[0.9, 0.5, 0.0, 0.0]]),
        }
        res = decode_vie_outputs(outputs, v, ("k0", "k1", "k2"),
                                 orig_size=(100, 200))
        assert len(res) == 2
        assert res[0]["class"] == "k0" and res[1]["class"] == "k2"
        assert res[0]["text"] == "a" * Lr
        assert res[0]["score"] == pytest.approx(0.9)
        # rect: min/max of poly bins scaled by (w, h) / num_bins
        nb = v.num_bins
        r = res[0]["rects"][0]
        assert r[0] == pytest.approx(2 / nb * 200)
        assert r[1] == pytest.approx(4 / nb * 100)
        assert r[2] == pytest.approx(10 / nb * 200)
        assert r[3] == pytest.approx(16 / nb * 100)
