"""Training metrics logging.

Replaces the two vendored copies of DETR's MetricLogger/SmoothedValue
(reference: MGP-STR utils_dist.py:22-114 and OmniParser utils/logger.py)
— minus their `synchronize_between_processes` all_reduce: under pjit the
loss/metric scalars coming out of the train step are already global, so a
host-side window is all that's left.
"""

from __future__ import annotations

import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Optional


class SmoothedValue:
    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1) -> None:
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

    @property
    def median(self) -> float:
        s = sorted(self.deque)
        return s[len(s) // 2] if s else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / max(len(self.deque), 1)

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, value=self.value)


class MetricLogger:
    def __init__(self, delimiter: str = "  ", print_fn=print):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.print_fn = print_fn

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def add_meter(self, name: str, meter: SmoothedValue) -> None:
        self.meters[name] = meter

    def __str__(self) -> str:
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = "") -> Iterable:
        """Yields (iter_time, item) like the reference's logger
        (OmniParser utils/logger.py MetricLogger.log_every)."""
        it_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.perf_counter()
        for i, obj in enumerate(iterable):
            it_time.update(time.perf_counter() - end)
            yield it_time.avg, obj
            if i % print_freq == 0:
                self.print_fn(f"{header} [{i}] iter_time: {it_time} | {self}")
            end = time.perf_counter()


def nan_guard(loss: float, step: int) -> None:
    """Abort on non-finite loss (reference: OmniParser engine/train.py:46-49
    exits the job on inf/nan)."""
    import math

    if not math.isfinite(loss):
        raise FloatingPointError(
            f"Loss is {loss} at step {step}; stopping training "
            "(non-finite loss guard)")
