"""StableHLO export: the serialized artifact reproduces the in-package
forward exactly and round-trips through jax.export deserialization (the
deployment-path analog of LiteWeightOCR's MNN export)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestExport:
    def test_mgp_str_roundtrip(self, tmp_path, monkeypatch):
        import advancedliteratemachinery_tpu.models.mgp_str as MM
        from advancedliteratemachinery_tpu.models.vit import ViTConfig

        orig = MM.MGPSTRConfig
        small_vit = ViTConfig(embed_dim=32, depth=1, num_heads=2)

        def tiny(**kw):
            kw.update(batch_max_length=6, vit=small_vit,
                      vocab_pad_multiple=8)
            return orig(**kw)

        monkeypatch.setattr(MM, "MGPSTRConfig", tiny)
        from advancedliteratemachinery_tpu.engine.export import (
            export_recognizer, load_exported)

        out = tmp_path / "mgp.stablehlo"
        path, nbytes = export_recognizer("mgp_str", "tiny", str(out),
                                         batch_size=2)
        assert nbytes > 1000 and out.exists()

        fn = load_exported(path)
        u8 = np.random.default_rng(0).integers(
            0, 256, (2, 32, 128, 3), np.uint8)
        got = fn(jnp.asarray(u8))
        assert set(got.keys()) == {"char", "bpe", "wp"}
        assert np.isfinite(np.asarray(got["char"], np.float32)).all()

        # equality vs the in-package forward with the same weights
        from advancedliteratemachinery_tpu.models.mgp_str import (
            MGPSTR, MGPSTRConfig)
        from advancedliteratemachinery_tpu.ops.image import normalize_crops

        model = MGPSTR(MGPSTRConfig(variant="tiny", batch_max_length=6,
                                    vit=small_vit, vocab_pad_multiple=8))
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 32, 128, 3)))["params"]
        want = model.apply(
            {"params": params},
            normalize_crops(jnp.asarray(u8),
                            dtype=model.policy.compute_dtype))
        g = np.asarray(got["char"], np.float32)
        w = np.asarray(want["char"], np.float32)
        # bf16 compute + constant-folded weights: values agree to bf16
        # precision, decoded ids exactly
        np.testing.assert_allclose(g, w, rtol=3e-2, atol=3e-2)
        np.testing.assert_array_equal(g.argmax(-1), w.argmax(-1))

    def test_cli(self, tmp_path, monkeypatch, capsys):
        import advancedliteratemachinery_tpu.models.mgp_str as MM
        from advancedliteratemachinery_tpu.models.vit import ViTConfig

        orig = MM.MGPSTRConfig
        small_vit = ViTConfig(embed_dim=32, depth=1, num_heads=2)

        def tiny(**kw):
            kw.update(batch_max_length=6, vit=small_vit,
                      vocab_pad_multiple=8)
            return orig(**kw)

        monkeypatch.setattr(MM, "MGPSTRConfig", tiny)
        from advancedliteratemachinery_tpu import cli
        rc = cli.main(["export", str(tmp_path / "m.hlo"),
                       "--model", "mgp_str", "--variant", "tiny"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["bytes"] > 0
