"""utils/logging.py — metrics meters, JSONL logging, profiling helpers.

Pins the observability contracts the reference scatters across
common/logger.py:19-181 (SmoothedValue/MetricLogger) and
runner_base.py:729-745 (JSON-lines log.txt).
"""
import json

import jax
import jax.numpy as jnp

from radialog_tpu.utils.logging import (JsonlLogger, MetricLogger,
                                        SmoothedValue, StepTimer,
                                        profile_trace)


def test_smoothed_value_stats():
    sv = SmoothedValue(window_size=3)
    for v in [1.0, 2.0, 3.0, 4.0]:
        sv.update(v)
    assert sv.median == 3.0          # window keeps the last 3: [2, 3, 4]
    assert sv.avg == 3.0
    assert sv.global_avg == 2.5      # all 4 values


def test_metric_logger_log_every_and_avgs():
    printed = []
    ml = MetricLogger(print_fn=printed.append)
    seen = list(ml.log_every(range(5), print_freq=2, header="it"))
    assert seen == list(range(5))
    ml.update(loss=2.0)
    ml.update(loss=4.0)
    assert ml.global_avgs()["loss"] == 3.0
    assert any("it" in line for line in printed)


def test_jsonl_logger_writes_parseable_records(tmp_path):
    path = tmp_path / "log.jsonl"
    lg = JsonlLogger(path)
    lg.log({"step": 1, "loss": jnp.float32(2.5)})   # device scalars coerced
    lg.log({"step": 2, "loss": 1.25})
    rows = [json.loads(line) for line in path.read_text().splitlines()]
    assert rows == [{"step": 1, "loss": 2.5}, {"step": 2, "loss": 1.25}]


def test_profile_trace_noop_and_real(tmp_path):
    with profile_trace(None):        # gated off: must be a no-op
        pass
    with profile_trace(str(tmp_path / "trace")):
        jnp.ones((4,)).sum().block_until_ready()
    assert any((tmp_path / "trace").rglob("*"))      # wrote trace artifacts


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        with t.step(sync_on=jnp.ones((8,)).sum()):
            pass
    s = t.summary()
    assert len(t.times) == 3
    assert s["mean_s"] >= 0.0 and s["p50_s"] >= 0.0 and s["p90_s"] >= 0.0
    assert StepTimer().summary() == {}
