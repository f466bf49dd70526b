"""LevOCR training path: imitation-learning batch construction (noise
roll-in + Levenshtein supervision, reference models.py inject_noise +
levt/levenshtein_utils.py) + fit() over the BatchNorm model."""

import io

import jax
import numpy as np
from PIL import Image, ImageDraw

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.data.lmdb_writer import write_lmdb
from advancedliteratemachinery_tpu.data.str_dataset import (
    BalancedMixer,
    LmdbStrDataset,
)
from advancedliteratemachinery_tpu.engine import batches as B
from advancedliteratemachinery_tpu.engine.fit import FitConfig, fit
from advancedliteratemachinery_tpu.models.levocr import (
    BOS,
    EOS,
    PAD,
    UNK,
    LevOCR,
    LevOCRConfig,
    LevtDictionary,
)
from advancedliteratemachinery_tpu.models.abinet import ABINetVisionConfig
from advancedliteratemachinery_tpu.parallel.mesh import create_mesh

TEXTS = ["cat", "dog", "sun", "car"]


def _lmdb(tmp_path):
    data = {b"num-samples": str(len(TEXTS)).encode()}
    for i, t in enumerate(TEXTS, start=1):
        im = Image.new("RGB", (96, 32), "white")
        ImageDraw.Draw(im).text((6, 8), t, fill="black")
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        data[b"image-%09d" % i] = buf.getvalue()
        data[b"label-%09d" % i] = t.encode()
    d = tmp_path / "train"
    d.mkdir()
    write_lmdb(str(d / "data.mdb"), data)
    return str(d)


TINY = LevOCRConfig(max_len=10, d_model=64, heads=2, ffn=128, layers=1,
                    max_iter=1,
                    vision=ABINetVisionConfig(max_length=8, num_classes=37,
                                              d_model=64, backbone_layers=1))


class TestLevocrBatches:
    def test_supervision_structure(self, tmp_path):
        d = LevtDictionary(max_len=TINY.max_len)
        ds = LmdbStrDataset(_lmdb(tmp_path), charset="".join(d.itos[4:]),
                            max_length=8)
        mixer = BalancedMixer([ds], [1.0], batch_size=4, seed=0)
        b = next(B.levocr_batches(mixer, d, vision_len=8))
        assert b["images"].shape == (4, 32, 128, 3)
        # noised is a subsequence of the target, bos/eos preserved
        for row in b["noised_tokens"]:
            assert row[0] == BOS and EOS in row
        # masked target carries UNK exactly at inserted positions
        assert (b["masked_tgt_tokens"][b["word_ins_masks"]] == UNK).all()
        # deletion targets are binary over prediction slots
        assert set(np.unique(b["word_del_targets"])) <= {0, 1}
        # vision targets: chars 1-based, zero-padded
        assert b["vision_targets"].max() >= 1
        assert b["vision_targets"].shape == (4, 8)

    def test_fit_runs(self, tmp_path):
        model = LevOCR(TINY, policy=FP32_POLICY)
        d = LevtDictionary(max_len=TINY.max_len)
        ds = LmdbStrDataset(_lmdb(tmp_path), charset="".join(d.itos[4:]),
                            max_length=8)
        mixer = BalancedMixer([ds], [1.0], batch_size=4, seed=0)
        it = B.levocr_batches(mixer, d, vision_len=8)
        tok = np.asarray(d.encode([""] * 1))
        variables = model.init(jax.random.PRNGKey(0),
                               np.zeros((1, 32, 128, 3), np.float32),
                               tok, tok, tok)
        loss_fn, tx = B.levocr_recipe_u8(model, TINY)
        res = fit(loss_fn, tx, variables["params"], it,
                  FitConfig(total_steps=3, log_interval=1),
                  mesh=create_mesh(data=1, devices=jax.devices()[:1]),
                  batch_stats=variables["batch_stats"],
                  log_fn=lambda m: None)
        assert res.steps_run == 3
        assert np.isfinite(res.last_metrics["loss"])
