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
