"""Multichip coverage beyond MGP-STR: the decode-heavy model (OmniParser)
and a BatchNorm-carrying model (DB via MutableTrainState) must train
sharded over the virtual 2x2x2 dp/fsdp/tp mesh — the same axes the
multichip dryrun exercises (tests/conftest.py provides the 8 CPU
devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.recipes import (
    db_recipe,
    omniparser_recipe,
)
from advancedliteratemachinery_tpu.engine.train import TrainState, make_train_step
from advancedliteratemachinery_tpu.engine.train_extras import (
    MutableTrainState,
    make_mutable_train_step,
)
from advancedliteratemachinery_tpu.parallel.mesh import batch_sharding, create_mesh

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


class TestOmniParserSharded:
    def test_trains_on_2x2x2_mesh(self):
        from advancedliteratemachinery_tpu.models.omniparser import (
            OmniParser, OmniParserConfig)

        mesh = create_mesh(data=2, fsdp=2, model=2)
        cfg = OmniParserConfig(
            swin_variant="tiny", d_model=32, nhead=2, dec_layers=1,
            dim_feedforward=64, num_bins=20, chars="ab",
            max_position_embeddings=32, drop_path_rate=0.0)
        model = OmniParser(cfg, policy=FP32_POLICY)
        v = cfg.vocab()
        rng = np.random.default_rng(0)
        B = 8
        batch = {"images": jax.random.normal(jax.random.PRNGKey(0),
                                             (B, 64, 64, 3))}
        for task, L in (("pt", 6), ("poly", 5), ("rec", 5)):
            batch[f"{task}_in"] = jnp.asarray(
                rng.integers(0, 20, (B, L)), jnp.int32)
            batch[f"{task}_out"] = jnp.asarray(
                rng.integers(0, 20, (B, L)), jnp.int32)
        seqs = {"pt": batch["pt_in"], "poly": batch["poly_in"],
                "rec": batch["rec_in"]}
        params = model.init(jax.random.PRNGKey(1), batch["images"][:1],
                            jax.tree.map(lambda x: x[:1], seqs))["params"]
        loss_fn, tx = omniparser_recipe(model, v.padding_index)
        state = TrainState.create(params, tx)
        step, shardings = make_train_step(loss_fn, state, mesh)
        state = jax.device_put(state, shardings)
        batch = jax.device_put(batch, batch_sharding(mesh))
        losses = []
        for i in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]


class TestBatchNormModelSharded:
    def test_db_mutable_state_trains_on_mesh(self):
        """MutableTrainState over (data, fsdp): gradients AND BatchNorm
        batch_stats flow through the sharded step (the reference needs
        explicit SyncBN conversion — OmniParser model/__init__.py:17;
        here the mesh reduction does it)."""
        from advancedliteratemachinery_tpu.models.db import DBConfig, DBDetector

        mesh = create_mesh(data=4, fsdp=2, model=1)
        model = DBDetector(DBConfig(width=8, fpn_dim=16, head_dim=8),
                           policy=FP32_POLICY)
        B, H, W = 8, 64, 64
        rng = np.random.default_rng(0)
        batch = {
            "images": jnp.asarray(rng.standard_normal((B, H, W, 3)),
                                  jnp.float32),
            "gt_prob": jnp.asarray(rng.random((B, H, W, 1)) > 0.7,
                                   jnp.float32),
            "gt_thresh": jnp.asarray(rng.random((B, H, W, 1)), jnp.float32),
        }
        variables = model.init(jax.random.PRNGKey(0), batch["images"][:1],
                               train=True)
        loss_fn, tx = db_recipe(model)
        state = MutableTrainState.create(variables["params"],
                                         variables["batch_stats"], tx)
        step, shardings = make_mutable_train_step(loss_fn, state, mesh)
        state = jax.device_put(state, shardings)
        batch = jax.device_put(batch, batch_sharding(mesh))
        stats_before = jax.tree.leaves(
            jax.device_get(state.batch_stats))[0].copy()
        losses = []
        for i in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
        stats_after = jax.tree.leaves(jax.device_get(state.batch_stats))[0]
        assert not np.allclose(stats_before, stats_after)  # BN stats moved
