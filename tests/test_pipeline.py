"""Pipeline parallelism (parallel/pipeline.py) on the virtual 8-device mesh.

The reference has no pipeline parallelism to mirror (SURVEY §2.3); these
tests pin the GPipe schedule against the plain sequential layer stack:
forward equality, gradient equality through the reverse pipeline, and the
dp x pp combination.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedliteratemachinery_tpu.parallel.pipeline import (
    create_pipeline_mesh,
    gpipe_apply,
    make_scan_stage,
    partition_stages,
    split_microbatches,
    stack_layer_params,
)

pytestmark = pytest.mark.model


def _mlp_layer(p, x):
    # residual MLP keeps activation shape for ring chaining
    return x + jnp.tanh(x @ p["w"] + p["b"])


def _make_layers(key, n_layers, dim):
    keys = jax.random.split(key, n_layers)
    return [
        {
            "w": jax.random.normal(k, (dim, dim)) * 0.3,
            "b": jnp.zeros((dim,)),
        }
        for k in keys
    ]


def _sequential(layers, x):
    for p in layers:
        x = _mlp_layer(p, x)
    return x


class TestGPipe:
    def test_forward_matches_sequential(self):
        L, S, M, B, D = 8, 4, 4, 16, 32
        layers = _make_layers(jax.random.PRNGKey(0), L, D)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, D))

        mesh = create_pipeline_mesh(pipe=S, data=1,
                                    devices=jax.devices()[:S])
        stages = partition_stages(stack_layer_params(layers), S)
        mbs = split_microbatches(x, M)
        stage_fn = make_scan_stage(_mlp_layer)

        out = jax.jit(
            lambda sp, mb: gpipe_apply(stage_fn, sp, mb, mesh)
        )(stages, mbs)
        ref = _sequential(layers, x)
        np.testing.assert_allclose(
            np.asarray(out).reshape(B, D), np.asarray(ref),
            rtol=1e-5, atol=1e-5)

    def test_gradients_match_sequential(self):
        L, S, M, B, D = 8, 4, 8, 16, 16
        layers = _make_layers(jax.random.PRNGKey(2), L, D)
        x = jax.random.normal(jax.random.PRNGKey(3), (B, D))
        tgt = jax.random.normal(jax.random.PRNGKey(4), (B, D))

        mesh = create_pipeline_mesh(pipe=S, data=1,
                                    devices=jax.devices()[:S])
        mbs = split_microbatches(x, M)
        tgts = split_microbatches(tgt, M)
        stage_fn = make_scan_stage(_mlp_layer)

        def pipe_loss(stacked):
            stages = partition_stages(stacked, S)
            out = gpipe_apply(stage_fn, stages, mbs, mesh)
            return jnp.mean((out - tgts) ** 2)

        def seq_loss(stacked):
            def body(h, p):
                return _mlp_layer(p, h), None

            out, _ = jax.lax.scan(body, x, stacked)
            return jnp.mean((out - tgt) ** 2)

        stacked = stack_layer_params(layers)
        lp, gp = jax.jit(jax.value_and_grad(pipe_loss))(stacked)
        ls, gs = jax.jit(jax.value_and_grad(seq_loss))(stacked)
        np.testing.assert_allclose(float(lp), float(ls), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_data_times_pipe_mesh(self):
        """dp=2 x pp=4 over all 8 virtual devices: microbatch batch dim
        sharded over data, stages over pipe."""
        L, S, M, B, D = 4, 4, 4, 16, 16
        layers = _make_layers(jax.random.PRNGKey(5), L, D)
        x = jax.random.normal(jax.random.PRNGKey(6), (B, D))

        mesh = create_pipeline_mesh(pipe=S, data=2)
        stages = partition_stages(stack_layer_params(layers), S)
        mbs = split_microbatches(x, M)
        stage_fn = make_scan_stage(_mlp_layer)

        out = jax.jit(
            lambda sp, mb: gpipe_apply(stage_fn, sp, mb, mesh)
        )(stages, mbs)
        ref = _sequential(layers, x)
        np.testing.assert_allclose(
            np.asarray(out).reshape(B, D), np.asarray(ref),
            rtol=1e-5, atol=1e-5)

    def test_microbatch_split_validates(self):
        with pytest.raises(ValueError):
            split_microbatches(jnp.zeros((10, 4)), 3)
        with pytest.raises(ValueError):
            partition_stages(stack_layer_params(
                _make_layers(jax.random.PRNGKey(0), 6, 4)), 4)


class TestTRCGPipeline:
    def test_trcg_trunk_pipelined_matches_model(self):
        """The real integration: a tiny TRCG's LlamaBlock stack, stacked
        and partitioned into 4 stages, reproduces the model's own forward
        logits (reference analog: AIGC/SceneVTG/TRCG 32-layer vicuna
        trunk — the stack pipeline parallelism exists for)."""
        from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
        from advancedliteratemachinery_tpu.models.vit import ViTConfig
        from advancedliteratemachinery_tpu.models.trcg import (
            TRCG, TRCGConfig, LlamaBlock)

        cfg = TRCGConfig(
            vocab_size=128, hidden_size=64, num_layers=4, heads=4,
            max_seq=64,
            vision=ViTConfig(img_size=(32, 32), patch_size=16,
                             embed_dim=64, depth=1, num_heads=4,
                             apply_final_norm=True))
        # fp32 policy: under bf16 the pipelined compilation materialises
        # intermediates at different points than the straight-line graph
        # (few-ulp drift); fp32 makes this a true equality check.
        model = TRCG(cfg, policy=FP32_POLICY)
        ids = jnp.asarray(
            np.random.default_rng(0).integers(1, 100, (8, 12)), jnp.int32)
        imgs = jnp.zeros((8, 32, 32, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), imgs, ids)
        ref = model.apply(variables, imgs, ids)

        params = variables["params"]
        layer_keys = [f"layer_{i}" for i in range(cfg.num_layers)]
        assert all(k in params for k in layer_keys)
        block = LlamaBlock(cfg, policy=FP32_POLICY)

        # everything outside the uniform block stack runs replicated
        prefix = model.apply(variables, imgs, ids, method=model._prefix,
                             deterministic=True)
        B, T, _ = prefix.shape
        # [1, T] broadcasts against each microbatch's [mb, T, H, hd]
        positions = jnp.arange(T)[None]
        bias = jnp.where(jnp.tril(jnp.ones((T, T), bool)),
                         0.0, -1e9)[None, None]

        def layer_fn(p, x):
            return block.apply({"params": p}, x, positions, bias)

        S, M = 4, 4
        mesh = create_pipeline_mesh(pipe=S, data=1,
                                    devices=jax.devices()[:S])
        stages = partition_stages(
            stack_layer_params([params[k] for k in layer_keys]), S)
        mbs = split_microbatches(prefix, M)
        out = jax.jit(
            lambda sp, mb: gpipe_apply(
                make_scan_stage(layer_fn), sp, mb, mesh)
        )(stages, mbs)
        h = np.asarray(out).reshape(prefix.shape)
        logits = model.apply(variables, jnp.asarray(h),
                             method=model._head)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
