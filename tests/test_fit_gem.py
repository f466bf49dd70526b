"""GEM SWDE fine-tune path: preprocessed node-token records → token
classification through fit() (reference run_swde/run.py train loop)."""

import json

import jax
import numpy as np

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine import batches as B
from advancedliteratemachinery_tpu.engine.fit import FitConfig, fit
from advancedliteratemachinery_tpu.engine.recipes import gem_swde_recipe
from advancedliteratemachinery_tpu.models.gem import GEMConfig, GEMForSWDE
from advancedliteratemachinery_tpu.parallel.mesh import create_mesh

TINY = GEMConfig(vocab_size=100, hidden_size=16, num_layers=1, heads=2,
                 max_position=32, max_xpath_depth=3, xpath_tag_vocab=7,
                 xpath_subs_vocab=5, xpath_unit_hidden=4, num_labels=4)


def _manifest(tmp_path):
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(3):
        n = 6
        rows.append({
            "input_ids": rng.integers(1, 100, n).tolist(),
            "xpath_tags_seq": rng.integers(0, 7, (n, 3)).tolist(),
            "xpath_subs_seq": rng.integers(0, 5, (n, 3)).tolist(),
            "labels": rng.integers(0, 4, n).tolist(),
            "render_bbox": rng.random((n, 4)).tolist(),
        })
    p = tmp_path / "swde.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    return str(p)


class TestFitGem:
    def test_batches_and_fit(self, tmp_path):
        ds = B.GEMSwdeDataset(_manifest(tmp_path))
        it = B.gem_swde_batches(ds, batch_size=2, max_seq=16,
                                xpath_depth=3)
        b = next(it)
        assert b["input_ids"].shape == (2, 16)
        assert (b["labels"][b["attention_mask"] == 0] == -100).all()
        assert (b["labels"][b["attention_mask"] == 1] >= 0).all()

        model = GEMForSWDE(TINY, policy=FP32_POLICY)
        params = model.init(jax.random.PRNGKey(0),
                            jax.tree.map(lambda a: a, b))["params"]
        loss_fn, tx = gem_swde_recipe(model)
        res = fit(loss_fn, tx, params, it,
                  FitConfig(total_steps=3, log_interval=1),
                  mesh=create_mesh(data=1, devices=jax.devices()[:1]),
                  log_fn=lambda m: None)
        assert res.steps_run == 3
        assert np.isfinite(res.last_metrics["loss"])


import pytest


@pytest.mark.slow
class TestGemOverfit:
    def test_overfits_swde_page_f1(self, tmp_path):
        """Task-metric overfit proof (VERDICT r4 item 4): the SWDE
        fine-tune path (node-token jsonl → gem_swde_batches →
        gem_swde_recipe → fit) takes the tiny model to macro page-level
        F1 == 1.0 over its three pages, scored by the reference protocol
        — per-node probability aggregation then constrained page-level
        P/R/F1 (eval/swde_metrics.py; reference run_swde/run.py
        page_level_constraint)."""
        import jax.numpy as jnp

        from advancedliteratemachinery_tpu.eval.swde_metrics import (
            aggregate_node_predictions,
            page_level_metrics,
        )

        attributes = ["none", "title", "author", "price"]
        ds = B.GEMSwdeDataset(_manifest(tmp_path))
        it = B.gem_swde_batches(ds, batch_size=3, max_seq=16, xpath_depth=3)
        gold = next(B.gem_swde_batches(ds, batch_size=3, max_seq=16,
                                       xpath_depth=3))
        import optax

        model = GEMForSWDE(TINY, policy=FP32_POLICY)
        params = model.init(jax.random.PRNGKey(0),
                            jax.tree.map(lambda a: a, gold))["params"]
        # recipe loss; its production optimizer (lr 2e-5, 1k-step warmup)
        # is still warming up at this proof's budget — flat LR instead
        loss_fn, _ = gem_swde_recipe(model)
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-3))

        batch_dev = {k: jnp.asarray(v) for k, v in gold.items()}
        fwd = jax.jit(lambda p, bb: model.apply({"params": p}, bb,
                                                deterministic=True))
        best = {"f1": 0.0}

        def eval_fn(state):
            logits = np.asarray(fwd(state.params, batch_dev))
            probs = np.exp(logits - logits.max(-1, keepdims=True))
            probs = probs / probs.sum(-1, keepdims=True)
            window_probs, window_infos = [], []
            for p in range(3):          # one window per page; each valid
                valid = gold["attention_mask"][p] == 1
                pos = np.nonzero(valid)[0]      # token == node
                truths = [attributes[gold["labels"][p, j]] for j in pos]
                window_probs.append(probs[p])
                window_infos.append((f"page{p}", pos.tolist(),
                                     [f"/x[{j}]" for j in pos], truths,
                                     ["t"] * len(pos)))
            nodes = aggregate_node_predictions(window_probs, window_infos)
            m = page_level_metrics(nodes, attributes)
            f1 = m["macro"]["f1"]
            best["f1"] = max(best["f1"], f1)
            return {"page_f1": f1}

        fit(loss_fn, tx, params, it,
            FitConfig(total_steps=300, log_interval=100, val_interval=25),
            mesh=create_mesh(data=1, devices=jax.devices()[:1]),
            eval_fn=eval_fn, log_fn=lambda m: None)
        assert best["f1"] == 1.0, \
            f"SWDE page-level macro F1 never reached 1.0 ({best})"


class TestWebSRCTraining:
    """`train gem --task websrc`: span-QA batches + recipe (reference
    run_websrc/run.py squad-style fine-tune)."""

    def _rows(self, tmp_path, S=10, D=3):
        import json
        rows = []
        for i in range(4):
            rows.append({
                "input_ids": list(range(1, S - 2)),
                "xpath_tags_seq": [[1] * D] * (S - 3),
                "xpath_subs_seq": [[2] * D] * (S - 3),
                "start_position": 2, "end_position": 4,
            })
        p = tmp_path / "websrc.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        return str(p)

    def test_batches_layout(self, tmp_path):
        from advancedliteratemachinery_tpu.engine import batches as B
        ds = B.GEMSwdeDataset(self._rows(tmp_path))
        b = next(B.gem_websrc_batches(ds, batch_size=2, max_seq=12,
                                      xpath_depth=3))
        assert b["input_ids"].shape == (2, 12)
        assert b["start_positions"].tolist() == [2, 2]
        assert b["end_positions"].tolist() == [4, 4]
        assert b["attention_mask"][0].sum() == 7

    def test_recipe_loss_and_grads(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
        from advancedliteratemachinery_tpu.engine import batches as B
        from advancedliteratemachinery_tpu.engine.recipes import (
            gem_websrc_recipe)
        from advancedliteratemachinery_tpu.models.gem import (
            GEMConfig, GEMForWebSRC)

        cfg = GEMConfig(vocab_size=60, hidden_size=32, num_layers=1,
                        heads=2, max_position=64, max_xpath_depth=3,
                        xpath_tag_vocab=8, xpath_subs_vocab=8,
                        xpath_unit_hidden=8, use_render_bbox=False)
        model = GEMForWebSRC(cfg, policy=FP32_POLICY)
        ds = B.GEMSwdeDataset(self._rows(tmp_path))
        b = next(B.gem_websrc_batches(ds, batch_size=2, max_seq=12,
                                      xpath_depth=3))
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        params = model.init(jax.random.PRNGKey(0), jb)["params"]
        loss_fn, tx = gem_websrc_recipe(model)
        (loss, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, jb, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        assert any(float(jnp.abs(g).sum()) > 0
                   for g in jax.tree.leaves(grads))
