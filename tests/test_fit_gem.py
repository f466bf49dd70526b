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
