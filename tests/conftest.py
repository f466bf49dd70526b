"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of a fake distributed backend (the reference
has no multi-node test pattern at all — SURVEY.md §4): XLA's host platform
is split into 8 virtual devices so every sharding/collective path is
exercised in CI without TPU hardware.

Note: the environment pre-imports jax config at interpreter startup
(sitecustomize), so JAX_PLATFORMS is latched before conftest runs —
`jax.config.update` is the reliable override.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


# ---- fast/model split (VERDICT r1 item 10) ----
# `pytest -m fast` = ops/codecs/data/eval units (<2 min, no model compiles);
# `pytest -m model` = compile-heavy model/import/engine suites.
import pytest  # noqa: E402

_FAST_MODULES = {
    "test_ops", "test_attention_op", "test_codecs", "test_augment",
    "test_data", "test_coco_spotting", "test_native", "test_eval",
    "test_metrics_streval", "test_spotting_eval", "test_harness_proctag",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.module.__name__.rsplit(".", 1)[-1]
        marker = "fast" if name in _FAST_MODULES else "model"
        item.add_marker(getattr(pytest.mark, marker))
