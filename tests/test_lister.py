import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.codecs.seq_codec import CtcCodec, EosSeqCodec
from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.models.focalnet import (
    FocalNet,
    FocalNetConfig,
    downsample_mask,
)
from advancedliteratemachinery_tpu.models.lister import (
    LISTER,
    LISTERConfig,
    NeighborDecoder,
    lister_losses,
    softmax_m1,
)


SMALL_FOCAL = FocalNetConfig(embed_dim=16, depths=(1, 1, 1, 1), drop_path_rate=0.0)


class TestFocalNet:
    def test_shapes_and_mask(self):
        model = FocalNet(SMALL_FOCAL, policy=FP32_POLICY)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 64, 3))
        mask = jnp.ones((2, 32, 64))
        params = model.init(jax.random.PRNGKey(1), x, mask)["params"]
        feat, fmask = model.apply({"params": params}, x, mask)
        # stem /4, three height-halving downsamples → h=1, w=W/4
        assert feat.shape == (2, 1, 16, 16 * 8)
        assert fmask.shape == (2, 1, 16)

    def test_padded_width_is_masked_out(self):
        """Features in padded region must be exactly zero, and valid-region
        features must not depend on padded pixel values."""
        model = FocalNet(SMALL_FOCAL, policy=FP32_POLICY)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 64, 3))
        mask = jnp.concatenate([jnp.ones((1, 32, 32)), jnp.zeros((1, 32, 32))], axis=2)
        params = model.init(jax.random.PRNGKey(1), x, mask)["params"]
        feat1, fmask = model.apply({"params": params}, x, mask)
        assert fmask[0, 0, :8].min() == 1 and fmask[0, 0, 8:].max() == 0
        # padded outputs zeroed
        np.testing.assert_array_equal(np.asarray(feat1[0, :, 8:, :]), 0.0)
        # change padded pixels → valid features unchanged
        x2 = x.at[:, :, 32:, :].set(123.0)
        feat2, _ = model.apply({"params": params}, x2, mask)
        np.testing.assert_allclose(np.asarray(feat1[0, :, :8, :]),
                                   np.asarray(feat2[0, :, :8, :]), atol=1e-5)

    def test_downsample_mask(self):
        m = jnp.zeros((1, 4, 8)).at[:, :, :4].set(1.0)
        dm = downsample_mask(m, (2, 4))
        assert dm.shape == (1, 2, 4)
        np.testing.assert_array_equal(np.asarray(dm[0, 0]), [1, 1, 0, 0])


class TestNeighborDecoder:
    def _decoder_output(self, train):
        cfg = LISTERConfig(variant="tiny", num_classes=37, max_ch=8, iters=0)
        dec = NeighborDecoder(cfg, feat_dim=16, policy=FP32_POLICY)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 12, 16))
        mask = jnp.ones((2, 1, 12))
        params = dec.init(jax.random.PRNGKey(1), x, mask, train=train)["params"]
        return dec.apply({"params": params}, x, mask, train=train)

    def test_output_shapes(self):
        res = self._decoder_output(train=True)
        assert len(res) == 1
        r = res[0]
        assert r["logits"].shape == (2, 8, 37)
        assert r["char_maps"].shape == (2, 8, 13)   # N+1 = 12+1
        assert r["char_masks"].shape == (2, 8)
        assert r["nb_map"].shape == (2, 13, 13)

    def test_char_maps_are_distributions(self):
        r = self._decoder_output(train=True)[0]
        sums = np.asarray(jnp.sum(r["char_maps"], axis=-1))
        np.testing.assert_allclose(sums, 1.0, atol=1e-4)

    def test_nb_map_eos_absorbing(self):
        r = self._decoder_output(train=False)[0]
        # last row of nb_map is one-hot on EOS slot
        np.testing.assert_allclose(np.asarray(r["nb_map"][:, -1, -1]), 1.0)
        np.testing.assert_allclose(np.asarray(r["nb_map"][:, -1, :-1]), 0.0)

    def test_align_chars_oracle(self):
        """Hand-built nb_map: a deterministic 3-hop chain 0→1→2→EOS.
        Walk must visit them in order and the mask must close after EOS."""
        cfg = LISTERConfig(max_ch=6, p_threshold=0.6)
        dec = NeighborDecoder(cfg, feat_dim=8, policy=FP32_POLICY)
        N = 4  # 4 spatial + 1 eos slot
        nb = np.zeros((1, N + 1, N + 1), np.float32)
        nb[0, 0, 1] = 1.0
        nb[0, 1, 2] = 1.0
        nb[0, 2, N] = 1.0  # → EOS
        nb[0, 3, 3] = 1.0
        nb[0, N, N] = 1.0
        start = np.zeros((1, N + 1), np.float32)
        start[0, 0] = 1.0

        # align_chars is pure given (start, nb) — bind with dummy params
        x = jnp.zeros((1, 1, N, 8))
        params = dec.init(jax.random.PRNGKey(0), x, jnp.ones((1, 1, N)))["params"]
        maps, masks = dec.apply(
            {"params": params}, jnp.asarray(start), jnp.asarray(nb), False,
            method=dec.align_chars)
        maps, masks = np.asarray(maps), np.asarray(masks)
        assert maps.shape == (1, 6, 5)
        np.testing.assert_allclose(maps[0, 0], start[0], atol=1e-5)
        assert maps[0, 1].argmax() == 1
        assert maps[0, 2].argmax() == 2
        assert maps[0, 3].argmax() == N  # EOS reached
        # mask: positions 0..3 open (EOS step included), then closed
        np.testing.assert_array_equal(masks[0, :5], [1, 1, 1, 1, 0])

    def test_softmax_m1(self):
        x = jnp.asarray([[0.5, 0.2, 0.3]])
        y = softmax_m1(x * 16, axis=-1)
        assert float(y.sum()) == pytest.approx(1.0, abs=1e-5)
        assert y[0, 0] > 0.9  # sharpened


class TestLISTEREndToEnd:
    @pytest.fixture(scope="class")
    def small_lister(self):
        cfg = LISTERConfig(variant="tiny", max_ch=8, iters=1, drop_path_rate=0.0)
        # shrink the encoder for tests
        import advancedliteratemachinery_tpu.models.lister as lister_mod
        model = LISTER(cfg, policy=FP32_POLICY)
        return cfg, model

    def test_forward_train_and_eval(self, small_lister):
        cfg, model = small_lister
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 48, 3))
        mask = jnp.ones((2, 32, 48))
        params = model.init(jax.random.PRNGKey(1), x, mask, train=True)["params"]
        res_train = model.apply({"params": params}, x, mask, train=True,
                                rngs={"dropout": jax.random.PRNGKey(2)})
        res_eval = model.apply({"params": params}, x, mask, train=False)
        assert len(res_train) == cfg.iters + 1
        assert res_eval[0]["logits"].shape == (2, 8, 37)

    def test_losses(self, small_lister):
        cfg, model = small_lister
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 48, 3))
        mask = jnp.ones((2, 32, 48))
        params = model.init(jax.random.PRNGKey(1), x, mask, train=True)["params"]
        res = model.apply({"params": params}, x, mask, train=True,
                          rngs={"dropout": jax.random.PRNGKey(2)})
        codec = EosSeqCodec(max_ch=cfg.max_ch)
        ids, lens = codec.encode(["abc", "hello12"])
        out = lister_losses(res, jnp.asarray(ids), jnp.asarray(lens), cfg)
        assert np.isfinite(float(out["loss"]))
        assert float(out["rec_loss"]) > 0

    def test_grad_flows(self, small_lister):
        cfg, model = small_lister
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 48, 3))
        mask = jnp.ones((1, 32, 48))
        params = model.init(jax.random.PRNGKey(1), x, mask, train=True)["params"]
        codec = EosSeqCodec(max_ch=cfg.max_ch)
        ids, lens = codec.encode(["ab"])

        def loss_fn(p):
            res = model.apply({"params": p}, x, mask, train=True,
                              rngs={"dropout": jax.random.PRNGKey(2)})
            return lister_losses(res, jnp.asarray(ids), jnp.asarray(lens), cfg)["loss"]

        grads = jax.grad(loss_fn)(params)
        gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
        assert np.isfinite(float(gnorm)) and float(gnorm) > 0


class TestSeqCodecs:
    def test_eos_roundtrip(self):
        codec = EosSeqCodec(max_ch=10)
        ids, lens = codec.encode(["abc", "z9"])
        assert lens.tolist() == [4, 3]
        assert codec.decode(ids) == ["abc", "z9"]

    def test_ctc_decode(self):
        codec = CtcCodec()
        # ids: blank a a blank b → "ab"
        ids = np.array([[0, 1, 1, 0, 2]])
        assert codec.decode(ids) == ["ab"]
