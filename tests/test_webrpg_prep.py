"""WebRPG cache builder: tokenized page jsonl -> .npz records consumed by
WebRPGCacheDataset/webrpg_batches (reference create_webrpg_data_2.py)."""

import json

import numpy as np
import pytest


def _manifest(tmp_path, n_pages=2, n_el=3, depth=3):
    rows = []
    rng = np.random.default_rng(0)
    for _ in range(n_pages):
        rows.append({
            "page_ids": rng.integers(1, 50, 6).tolist(),
            "page_xpath_tags": rng.integers(0, 5, (6, depth)).tolist(),
            "page_xpath_subs": rng.integers(0, 5, (6, depth)).tolist(),
            "elements": [{
                "text_ids": rng.integers(1, 50, 4).tolist(),
                "xpath_tags": rng.integers(0, 5, depth).tolist(),
                "xpath_subs": rng.integers(0, 5, depth).tolist(),
                "chrlen": int(rng.integers(1, 20)),
                "param_ids": rng.integers(0, 30, 5).tolist(),
            } for _ in range(n_el)],
        })
    p = tmp_path / "pages.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    return str(p)


class TestWebRPGCache:
    def test_build_and_feed_training(self, tmp_path):
        import jax

        from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
        from advancedliteratemachinery_tpu.data.webrpg_prep import (
            build_webrpg_cache)
        from advancedliteratemachinery_tpu.engine.batches import (
            WebRPGCacheDataset, webrpg_batches)
        from advancedliteratemachinery_tpu.models.gem import (
            GEMConfig, GEMEncoder)

        cfg = GEMConfig(vocab_size=60, hidden_size=16, num_layers=1,
                        heads=2, max_position=32, max_xpath_depth=3,
                        xpath_tag_vocab=8, xpath_subs_vocab=8,
                        xpath_unit_hidden=8, use_render_bbox=False)
        model = GEMEncoder(cfg, policy=FP32_POLICY)
        out = tmp_path / "cache"
        written = build_webrpg_cache(_manifest(tmp_path), str(out),
                                     model=model, max_seq=16,
                                     log=lambda *_: None)
        assert len(written) == 2

        ds = WebRPGCacheDataset(str(out))
        assert len(ds) == 2
        rec = ds[0]
        assert rec["param_ids"].shape == (3, 5)
        assert rec["global_text"].shape == (1, 16)
        assert rec["element_text"].shape == (3, 16)
        assert rec["xpath"].shape[0] == 3
        assert rec["element_mask"].tolist() == [1.0, 1.0, 1.0]
        # embeddings are finite and element-dependent
        assert np.isfinite(rec["element_text"]).all()
        assert not np.allclose(rec["element_text"][0],
                               rec["element_text"][1])

        b = next(webrpg_batches(ds, batch_size=2, max_elements=4))
        assert b["param_ids"].shape == (2, 4, 5)
        assert b["element_mask"][0].sum() == 3

    def test_cli(self, tmp_path, monkeypatch, capsys):
        import advancedliteratemachinery_tpu.models.gem as MG

        orig = MG.GEMConfig

        def tiny(**kw):
            kw.update(vocab_size=60, hidden_size=16, num_layers=1, heads=2,
                      max_position=32, max_xpath_depth=3, xpath_tag_vocab=8,
                      xpath_subs_vocab=8, xpath_unit_hidden=8)
            return orig(**kw)

        monkeypatch.setattr(MG, "GEMConfig", tiny)
        from advancedliteratemachinery_tpu import cli
        rc = cli.main(["webrpg-cache", _manifest(tmp_path),
                       str(tmp_path / "out"), "--max-seq", "16"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["pages"] == 2
