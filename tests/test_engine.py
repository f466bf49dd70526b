import jax
import jax.numpy as jnp
import numpy as np

from advancedliteratemachinery_tpu.codecs.char_codec import CharCodec
from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.train import (
    TrainState,
    cross_entropy_ignore_pad,
    make_mgp_str_train_step,
    make_optimizer,
)
from advancedliteratemachinery_tpu.models.mgp_str import MGPSTR, MGPSTRConfig
from advancedliteratemachinery_tpu.parallel.mesh import create_mesh, batch_sharding


def _tiny_cfg():
    # shrink vocabs so the test model is small
    return MGPSTRConfig(variant="tiny", batch_max_length=6,
                        bpe_vocab_size=64, wp_vocab_size=64)


def _batch(codec, B=8):
    rng = np.random.default_rng(0)
    images = rng.standard_normal((B, 32, 128, 3)).astype(np.float32)
    texts = ["ab12", "hello", "x", "test", "ab", "zz9", "q1w2", "ok"]
    _, char_ids = codec.encode(texts[:B])
    fake_sub = rng.integers(3, 60, (B, codec.max_tokens)).astype(np.int32)
    return {
        "images": jnp.asarray(images),
        "char_ids": jnp.asarray(char_ids),
        "bpe_ids": jnp.asarray(fake_sub),
        "wp_ids": jnp.asarray(fake_sub),
    }


class TestCrossEntropy:
    def test_matches_torch_semantics(self):
        # CE with ignore_index=0 averages over non-ignored targets only
        logits = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4, 5)),
                             jnp.float32)
        targets = jnp.asarray([[0, 2, 3, 0], [1, 0, 0, 0]])
        got = cross_entropy_ignore_pad(logits, targets)
        logp = jax.nn.log_softmax(logits, -1)
        want = -(logp[0, 1, 2] + logp[0, 2, 3] + logp[1, 0, 1]) / 3
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    def test_all_ignored_is_finite(self):
        logits = jnp.ones((1, 2, 3))
        targets = jnp.zeros((1, 2), jnp.int32)
        assert np.isfinite(float(cross_entropy_ignore_pad(logits, targets)))


class TestShardedTrainStep:
    def test_loss_decreases_on_8_device_mesh(self):
        assert jax.device_count() == 8
        mesh = create_mesh(data=4, fsdp=2, model=1)
        cfg = _tiny_cfg()
        model = MGPSTR(cfg, policy=FP32_POLICY)
        codec = CharCodec(batch_max_length=cfg.batch_max_length)
        batch = _batch(codec)

        params = model.init(jax.random.PRNGKey(0), batch["images"][:1])["params"]
        tx = make_optimizer(lr=1e-3, total_steps=100)
        state = TrainState.create(params, tx)

        step, shardings = make_mgp_str_train_step(model, state, mesh)
        state = jax.device_put(state, shardings)
        batch = jax.device_put(batch, batch_sharding(mesh))

        losses = []
        for i in range(5):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 5

    def test_tensor_parallel_head_sharding(self):
        mesh = create_mesh(data=2, fsdp=2, model=2)
        cfg = MGPSTRConfig(variant="tiny", batch_max_length=6,
                           bpe_vocab_size=50257, wp_vocab_size=64)
        model = MGPSTR(cfg, policy=FP32_POLICY)
        x = jnp.zeros((2, 32, 128, 3))
        params = model.init(jax.random.PRNGKey(0), x)["params"]

        from advancedliteratemachinery_tpu.parallel.sharding import infer_param_specs

        specs = infer_param_specs(params, mesh)
        bpe_spec = specs["bpe_head"]["kernel"]
        assert bpe_spec[-1] == "model"  # vocab dim tensor-parallel
