import io
import os

import numpy as np
import pytest
from PIL import Image

from advancedliteratemachinery_tpu.data.lmdb_reader import LmdbReader
from advancedliteratemachinery_tpu.data.str_dataset import (
    AlignCollate,
    BalancedMixer,
    LmdbStrDataset,
)
from advancedliteratemachinery_tpu.data.lmdb_writer import write_lmdb


@pytest.fixture()
def small_lmdb(tmp_path):
    data = {b"key-%03d" % i: b"value-%03d" % i for i in range(10)}
    data[b"num-samples"] = b"10"
    p = str(tmp_path / "data.mdb")
    write_lmdb(p, data)
    return p


class TestLmdbReader:
    def test_get(self, small_lmdb):
        with LmdbReader(small_lmdb) as r:
            assert r.get(b"key-003") == b"value-003"
            assert r.get(b"num-samples") == b"10"
            assert r.get(b"nope") is None

    def test_items_sorted(self, small_lmdb):
        with LmdbReader(small_lmdb) as r:
            keys = [k for k, _ in r.items()]
            assert keys == sorted(keys)
            assert len(keys) == 11

    def test_multi_page_tree(self, tmp_path):
        data = {b"k-%05d" % i: b"v-%05d" % i for i in range(500)}
        p = str(tmp_path / "data.mdb")
        write_lmdb(p, data, max_leaf_items=20)
        with LmdbReader(p) as r:
            for i in (0, 7, 123, 499):
                assert r.get(b"k-%05d" % i) == b"v-%05d" % i
            assert len(list(r.items())) == 500

    def test_overflow_values(self, tmp_path):
        big = bytes(range(256)) * 40  # 10240 bytes → 3 overflow pages
        data = {b"big": big, b"small": b"x"}
        p = str(tmp_path / "data.mdb")
        write_lmdb(p, data)
        with LmdbReader(p) as r:
            assert r.get(b"big") == big
            assert r.get(b"small") == b"x"

    def test_directory_path(self, tmp_path):
        d = tmp_path / "dataset"
        d.mkdir()
        write_lmdb(str(d / "data.mdb"), {b"a": b"1"})
        with LmdbReader(str(d)) as r:
            assert r.get(b"a") == b"1"


def _make_str_lmdb(tmp_path, labels):
    data = {b"num-samples": str(len(labels)).encode()}
    for i, label in enumerate(labels, start=1):
        img = Image.fromarray(
            np.random.default_rng(i).integers(0, 255, (20, 60, 3), np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        data[b"image-%09d" % i] = buf.getvalue()
        data[b"label-%09d" % i] = label.encode()
    p = str(tmp_path / "data.mdb")
    write_lmdb(p, data)
    return p


class TestStrDataset:
    def test_loads_and_filters(self, tmp_path):
        p = _make_str_lmdb(tmp_path, ["hello", "WORLD", "toolongxxxxxxxxxxxxxxxxxxxxxxxxx", "ok!"])
        ds = LmdbStrDataset(p, charset="abcdefghijklmnopqrstuvwxyz0123456789",
                            max_length=25)
        # 'toolong...' filtered by length; 'ok!' filtered by charset;
        # WORLD lowercased and kept
        assert len(ds) == 2
        img, label = ds[0]
        assert label == "hello"
        assert img.shape == (20, 60, 3)

    def test_align_collate(self, tmp_path):
        p = _make_str_lmdb(tmp_path, ["abc", "de"])
        ds = LmdbStrDataset(p, max_length=25)
        batch, labels = AlignCollate()(
            [ds[i] for i in range(len(ds))])
        assert batch.shape == (2, 32, 128, 3)
        assert batch.dtype == np.uint8
        assert labels == ["abc", "de"]

    def test_balanced_mixer_ratio(self, tmp_path):
        p1 = _make_str_lmdb(tmp_path / "a" if (tmp_path / "a").mkdir() or True else "", ["aa"] * 1)
        (tmp_path / "b").mkdir()
        p2 = _make_str_lmdb(tmp_path / "b", ["bb", "bc", "bd"])
        d1 = LmdbStrDataset(p1, max_length=25)
        d2 = LmdbStrDataset(p2, max_length=25)
        mixer = BalancedMixer([d1, d2], [0.5, 0.5], batch_size=8)
        batch = mixer.get_batch()
        assert len(batch) == 8
        labels = [l for _, l in batch]
        assert labels.count("aa") == 4  # wraps around the 1-sample source
