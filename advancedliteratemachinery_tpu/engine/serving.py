"""Continuous-batching inference server.

The north-star deployment shape (BASELINE.json: "greedy/beam decode loops
run device-side under continuous batching"): requests arrive one crop (or a
few) at a time; the server coalesces them into the fixed batch shape the
jitted graph was compiled for, pads partial batches, and fans results back
out. One compiled graph, no shape churn.

Host-side batching only — the device work is whatever `infer_fn` was built
from (e.g. MGPSTRInference.recognize).

Sizing note (measured): with N *synchronous* clients at most N requests are
ever in flight, so a batch_size far above the client concurrency mostly
pads (fill = N/batch). Pick batch_size ≈ expected concurrent requests, or
have clients submit futures asynchronously."""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Callable, List, Optional, Sequence

import numpy as np


class ContinuousBatcher:
    def __init__(self, infer_fn: Callable[[np.ndarray], Sequence],
                 batch_size: int, item_shape,
                 max_wait_ms: float = 5.0, dtype=np.uint8):
        """infer_fn: [batch_size, *item_shape] → sequence of per-item
        results. Requests smaller than batch_size wait up to max_wait_ms
        for co-travelers, then go padded."""
        self.infer_fn = infer_fn
        self.batch_size = batch_size
        self.item_shape = tuple(item_shape)
        self.max_wait = max_wait_ms / 1000.0
        self.dtype = dtype
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._started = False
        self.stats = {"batches": 0, "items": 0, "padded_slots": 0}

    def start(self) -> "ContinuousBatcher":
        if not self._started:
            self._worker.start()
            self._started = True
        return self

    def stop(self) -> None:
        self._stop.set()
        self._q.put(None)  # wake the worker
        if self._started:
            self._worker.join(timeout=5)

    def submit(self, item: np.ndarray) -> Future:
        """item: [*item_shape] → Future of the per-item result."""
        if item.shape != self.item_shape:
            raise ValueError(f"item shape {item.shape} != {self.item_shape}")
        fut: Future = Future()
        self._q.put((np.asarray(item, self.dtype), fut))
        return fut

    def __call__(self, items: Sequence[np.ndarray]) -> List:
        """Blocking convenience: submit many, wait for all."""
        futs = [self.submit(it) for it in items]
        return [f.result() for f in futs]

    def _collect(self) -> List:
        """Block for the first item, then soak up to batch_size within
        max_wait."""
        first = self._q.get()
        if first is None or self._stop.is_set():
            return []
        batch = [first]
        import time

        deadline = time.perf_counter() + self.max_wait
        while len(batch) < self.batch_size:
            timeout = deadline - time.perf_counter()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                break
            batch.append(nxt)
        return batch

    def _loop(self) -> None:
        while not self._stop.is_set():
            pairs = self._collect()
            if not pairs:
                continue
            buf = np.zeros((self.batch_size, *self.item_shape), self.dtype)
            for i, (item, _) in enumerate(pairs):
                buf[i] = item
            try:
                results = self.infer_fn(buf)
            except Exception as e:  # fan the error out to all waiters
                for _, fut in pairs:
                    fut.set_exception(e)
                continue
            for i, (_, fut) in enumerate(pairs):
                fut.set_result(results[i])
            self.stats["batches"] += 1
            self.stats["items"] += len(pairs)
            self.stats["padded_slots"] += self.batch_size - len(pairs)
