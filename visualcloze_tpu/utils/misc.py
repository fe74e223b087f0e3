"""Training observability: smoothed metrics and phase timers.

Counterpart of util/misc.py:20-150 (SmoothedValue / MetricLogger) minus the
torch.distributed sync — cross-host metric reduction on TPU happens inside
the compiled step (jax.lax.pmean) or via multihost_utils, not host
collectives. Adds a jax.profiler trace hook (SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import datetime
import time
from collections import defaultdict, deque


class SmoothedValue:
    """Track a series over a sliding window + global average
    (ref util/misc.py:20-74)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1) -> None:
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        s = sorted(self.deque)
        return s[len(s) // 2] if s else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


class MetricLogger:
    """Windowed metric aggregation + ETA logging (ref util/misc.py:77-150)."""

    def __init__(self, delimiter: str = "  "):
        self.meters: dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self) -> str:
        return self.delimiter.join(f"{name}: {meter}" for name, meter in self.meters.items())

    def log_every(self, iterable, print_freq: int, logger, header: str = ""):
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        for i, obj in enumerate(iterable):
            t0 = time.time()
            yield obj
            iter_time.update(time.time() - t0)
            if i % print_freq == 0:
                eta = iter_time.global_avg * (len(iterable) - i)
                logger.info(
                    f"{header} [{i}/{len(iterable)}] eta: "
                    f"{datetime.timedelta(seconds=int(eta))} {self} time: {iter_time}"
                )
        logger.info(f"{header} total: {datetime.timedelta(seconds=int(time.time() - start))}")


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """jax.profiler trace scope; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Per-step phase wall-clock (DataloadSecs/EncodeSecs/TrainSecs parity,
    ref train.py:591-664). Use .mark(name) between phases."""

    def __init__(self):
        self.meters: dict[str, SmoothedValue] = defaultdict(lambda: SmoothedValue(fmt="{avg:.3f}"))
        self._last = time.time()

    def mark(self, name: str) -> None:
        now = time.time()
        self.meters[name].update(now - self._last)
        self._last = now

    def reset(self) -> None:
        self._last = time.time()

    def summary(self) -> str:
        return " ".join(f"{k}: {v.avg:.3f}s" for k, v in self.meters.items())
