"""STR benchmark runner: LMDB eval sets → per-set + weighted accuracy.

Parity target: MGP-STR benchmark_all_eval (test_final.py:29) — iterate the
standard eval LMDBs (IIIT5k/SVT/IC13/IC15/SVTP/CUTE...), report per-set and
sample-weighted total accuracy, per-head + confidence-fused numbers.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import numpy as np

from advancedliteratemachinery_tpu.data.str_dataset import AlignCollate, LmdbStrDataset
from advancedliteratemachinery_tpu.eval.str_metrics import (
    STRAccuracyCounter,
    benchmark_summary,
)


def evaluate_str_dataset(recognize_fn: Callable, dataset,
                         batch_size: int = 64,
                         collate: AlignCollate = None) -> Dict[str, STRAccuracyCounter]:
    """recognize_fn: uint8 [B,h,w,3] → list of (text, conf, head).
    Returns counters per head + 'fused'."""
    collate = collate or AlignCollate()
    counters: Dict[str, STRAccuracyCounter] = {"fused": STRAccuracyCounter()}
    n = len(dataset)
    for start in range(0, n, batch_size):
        samples = [dataset[i] for i in range(start, min(start + batch_size, n))]
        batch, labels = collate(samples)
        if len(samples) < batch_size:  # fixed-shape pad for the jitted graph
            pad = np.zeros((batch_size - len(samples), *batch.shape[1:]),
                           batch.dtype)
            batch = np.concatenate([batch, pad])
        results = recognize_fn(batch)[: len(labels)]
        for (text, conf, head), gt in zip(results, labels):
            counters["fused"].add(text, gt)
            counters.setdefault(head, STRAccuracyCounter()).add(text, gt)
    return counters


def benchmark_all_eval(recognize_fn: Callable, data_dirs: Sequence[str],
                       charset: str = None, max_length: int = 25,
                       batch_size: int = 64) -> Dict[str, float]:
    """test_final.py:29 protocol: per-set accuracy + weighted total."""
    per_set: Dict[str, STRAccuracyCounter] = {}
    for path in data_dirs:
        name = path.rstrip("/").split("/")[-1]
        ds = LmdbStrDataset(path, charset=charset, max_length=max_length)
        counters = evaluate_str_dataset(recognize_fn, ds, batch_size)
        per_set[name] = counters["fused"]
    return benchmark_summary(per_set)
