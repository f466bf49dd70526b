import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
)
from advancedliteratemachinery_tpu.parallel.sharding import (
    infer_param_specs,
    shard_params,
)
from jax.sharding import PartitionSpec as P


class TestMesh:
    def test_create_full_data(self):
        mesh = create_mesh()
        assert mesh.shape["data"] == 8
        assert mesh.shape["fsdp"] == 1

    def test_create_3d(self):
        mesh = create_mesh(data=2, fsdp=2, model=2)
        assert dict(mesh.shape) == {"data": 2, "fsdp": 2, "model": 2}

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError):
            create_mesh(data=3, fsdp=1, model=1)

    def test_batch_sharding_splits_batch(self):
        mesh = create_mesh(data=4, fsdp=2)
        x = jnp.zeros((16, 8))
        xs = jax.device_put(x, batch_sharding(mesh))
        # batch dim split 8 ways
        assert xs.addressable_shards[0].data.shape == (2, 8)


class TestShardingRules:
    def test_tp_on_large_head(self):
        mesh = create_mesh(data=2, fsdp=1, model=4)
        params = {"head": {"kernel": jnp.zeros((192, 50257 - 50257 % 4 + 4))}}
        # use divisible vocab
        params = {"head": {"kernel": jnp.zeros((192, 50260))}}
        specs = infer_param_specs(params, mesh)
        assert specs["head"]["kernel"] == P(None, "model")

    def test_small_weights_replicated_without_fsdp(self):
        mesh = create_mesh(data=8)
        params = {"w": jnp.zeros((64, 64)), "b": jnp.zeros((64,))}
        specs = infer_param_specs(params, mesh)
        assert specs["w"] == P()
        assert specs["b"] == P()

    def test_fsdp_shards_largest_dim(self):
        mesh = create_mesh(data=2, fsdp=4)
        params = {"w": jnp.zeros((64, 128))}
        specs = infer_param_specs(params, mesh)
        assert specs["w"] == P(None, "fsdp")

    def test_shard_params_values_unchanged(self):
        mesh = create_mesh(data=2, fsdp=4)
        w = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
        sharded = shard_params({"w": w}, mesh)
        np.testing.assert_array_equal(np.asarray(sharded["w"]), np.asarray(w))


class TestShardedInferenceEquivalence:
    """tp+fsdp-sharded forward must produce the SAME numbers as the
    replicated single-logical-device forward — the correctness property
    behind serving a model-parallel engine (XLA inserts the collectives
    from the shardings; no model code changes)."""

    def test_mgp_str_tp_forward_matches_replicated(self):
        import jax
        import jax.numpy as jnp

        from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
        from advancedliteratemachinery_tpu.models.mgp_str import (
            MGPSTR, MGPSTRConfig)
        from advancedliteratemachinery_tpu.models.vit import ViTConfig
        from advancedliteratemachinery_tpu.parallel.mesh import (
            batch_spec, create_mesh)
        from advancedliteratemachinery_tpu.parallel.sharding import (
            param_shardings)

        cfg = MGPSTRConfig(
            variant="tiny",
            vit=ViTConfig(embed_dim=64, depth=1, num_heads=2),
            vocab_pad_multiple=64)
        model = MGPSTR(cfg, policy=FP32_POLICY)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (8, 32, 128, 3)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x[:1])["params"]

        want = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, x)

        mesh = create_mesh(data=2, fsdp=2, model=2)
        # low threshold so the bpe/wp heads actually column-shard
        shardings = param_shardings(params, mesh, tp_threshold=1024)
        sharded = jax.device_put(params, shardings)
        xb = jax.device_put(x, jax.sharding.NamedSharding(mesh, batch_spec()))
        got = jax.jit(lambda p, x: model.apply({"params": p}, x))(sharded, xb)

        for head in ("char", "bpe", "wp"):
            np.testing.assert_allclose(np.asarray(got[head]),
                                       np.asarray(want[head]),
                                       rtol=2e-5, atol=2e-5)
