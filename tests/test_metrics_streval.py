import numpy as np
import pytest

from advancedliteratemachinery_tpu.utils.metrics import (
    MetricLogger,
    SmoothedValue,
    nan_guard,
)


class TestSmoothedValue:
    def test_window_and_global(self):
        v = SmoothedValue(window_size=2)
        for x in (1.0, 2.0, 3.0):
            v.update(x)
        assert v.avg == pytest.approx(2.5)        # window [2, 3]
        assert v.global_avg == pytest.approx(2.0)  # all
        assert v.value == 3.0

    def test_logger(self):
        lines = []
        log = MetricLogger(print_fn=lines.append)
        out = list(log.log_every(range(5), print_freq=2, header="E0"))
        assert len(out) == 5
        assert any("E0" in l for l in lines)
        log.update(loss=1.0)
        assert "loss" in str(log)

    def test_nan_guard(self):
        nan_guard(1.0, 0)
        with pytest.raises(FloatingPointError):
            nan_guard(float("nan"), 5)


class TestStrEval:
    def test_benchmark_all_eval(self, tmp_path):
        import io
        import sys

        sys.path.insert(0, str(tmp_path))
        from PIL import Image

        sys.path.insert(0, "tests")
        from advancedliteratemachinery_tpu.data.lmdb_writer import write_lmdb

        def make_set(dirname, labels):
            d = tmp_path / dirname
            d.mkdir()
            data = {b"num-samples": str(len(labels)).encode()}
            for i, lab in enumerate(labels, 1):
                img = Image.new("RGB", (60, 20), "white")
                buf = io.BytesIO()
                img.save(buf, "PNG")
                data[b"image-%09d" % i] = buf.getvalue()
                data[b"label-%09d" % i] = lab.encode()
            write_lmdb(str(d / "data.mdb"), data)
            return str(d)

        setA = make_set("IIIT5k", ["cat", "dog"])
        setB = make_set("SVT", ["sun"])

        # oracle recognizer: returns the right answer for 2 of 3 samples
        answers = iter([("cat", 0.9, "char"), ("dog", 0.9, "char"),
                        ("xxx", 0.9, "char")])

        def recognize(batch):
            return [next(answers, ("", 0.0, "char")) for _ in range(len(batch))]

        from advancedliteratemachinery_tpu.eval.str_eval import benchmark_all_eval

        summary = benchmark_all_eval(recognize, [setA, setB], batch_size=4)
        assert summary["IIIT5k"] == pytest.approx(1.0)
        assert summary["SVT"] == pytest.approx(0.0)
        assert summary["total_accuracy"] == pytest.approx(2 / 3)
        assert summary["total_samples"] == 3
