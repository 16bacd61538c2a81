"""Metrics logging + profiling — first-class observability.

Replaces MetricLogger/SmoothedValue (model/lavis/common/logger.py:19-181) and
the JSON-lines log.txt (runner_base.py:729-737); adds jax.profiler tracing
(the reference has no profiler, SURVEY §5). wandb is optional and gated.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict, deque
from pathlib import Path
from typing import Dict, Iterable, Optional


class SmoothedValue:
    """Windowed median/avg + global avg (logger.py:19-78, minus the
    torch.distributed sync — under jit+SPMD, metrics are already global)."""

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
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    def __str__(self) -> str:
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg)


class MetricLogger:
    """Iteration logger with smoothed meters + iter/data timing
    (logger.py:81-181)."""

    def __init__(self, delimiter: str = "  ", print_fn=print):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.print_fn = print_fn

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __str__(self) -> str:
        return self.delimiter.join(f"{n}: {m}" for n, m in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = "") -> Iterable:
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                self.print_fn(f"{header} [{i}]  {self}  "
                              f"time: {iter_time}  data: {data_time}")
            i += 1
            end = time.time()
        self.print_fn(f"{header} done in {time.time() - start:.1f}s "
                      f"({(time.time() - start) / max(i, 1):.4f} s/it)")

    def global_avgs(self) -> Dict[str, float]:
        return {k: m.global_avg for k, m in self.meters.items()}


class JsonlLogger:
    """Append-only JSON-lines run log (the reference's log.txt,
    runner_base.py:730-737) with optional wandb mirroring."""

    def __init__(self, path: str | Path, wandb_run=None):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.wandb_run = wandb_run

    def log(self, record: Dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps({k: _jsonable(v) for k, v in record.items()}) + "\n")
        if self.wandb_run is not None:
            self.wandb_run.log(record)


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return float(v)


def maybe_wandb(project: Optional[str], name: Optional[str] = None,
                config: Optional[Dict] = None):
    """wandb.init if installed and project given, else None (the reference
    requires wandb unconditionally, pretraining/train.py:98-102)."""
    if not project:
        return None
    try:
        import wandb
    except ImportError:
        return None
    return wandb.init(project=project, name=name, config=config or {})


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace window; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall timing with device sync, for throughput reporting."""

    def __init__(self):
        self.times: list = []

    @contextlib.contextmanager
    def step(self, sync_on=None):
        import jax
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self.times.append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = sorted(self.times)
        return {"mean_s": sum(arr) / len(arr),
                "p50_s": arr[len(arr) // 2],
                "p90_s": arr[int(len(arr) * 0.9)]}
