import threading
import time

import numpy as np
import pytest

from advancedliteratemachinery_tpu.engine.serving import ContinuousBatcher


def echo_sum(batch):
    # per-item result = sum of the item
    return [float(batch[i].sum()) for i in range(len(batch))]


class TestContinuousBatcher:
    def test_coalesces_and_returns_per_item(self):
        calls = []

        def infer(batch):
            calls.append(len(batch))
            return echo_sum(batch)

        b = ContinuousBatcher(infer, batch_size=4, item_shape=(2, 2),
                              max_wait_ms=50).start()
        items = [np.full((2, 2), i, np.uint8) for i in range(4)]
        out = b(items)
        b.stop()
        assert out == [0.0, 4.0, 8.0, 12.0]
        assert calls == [4]  # one fused batch

    def test_partial_batch_padded(self):
        b = ContinuousBatcher(echo_sum, batch_size=8, item_shape=(2, 2),
                              max_wait_ms=10).start()
        out = b([np.ones((2, 2), np.uint8)])
        b.stop()
        assert out == [4.0]
        assert b.stats["padded_slots"] == 7

    def test_error_propagates(self):
        def broken(batch):
            raise RuntimeError("boom")

        b = ContinuousBatcher(broken, batch_size=2, item_shape=(1,),
                              max_wait_ms=5).start()
        fut = b.submit(np.zeros((1,), np.uint8))
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=5)
        b.stop()

    def test_bad_shape_rejected(self):
        b = ContinuousBatcher(echo_sum, batch_size=2, item_shape=(2, 2))
        with pytest.raises(ValueError):
            b.submit(np.zeros((3, 3), np.uint8))

    def test_concurrent_producers(self):
        b = ContinuousBatcher(echo_sum, batch_size=4, item_shape=(1,),
                              max_wait_ms=20).start()
        results = {}

        def produce(i):
            results[i] = b.submit(np.full((1,), i, np.uint8)).result(timeout=10)

        threads = [threading.Thread(target=produce, args=(i,)) for i in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        b.stop()
        assert results == {i: float(i) for i in range(10)}
