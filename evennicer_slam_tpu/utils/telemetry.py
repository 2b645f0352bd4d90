"""Observability: structured metrics logging, phase timers, profiler traces.

The reference's only observability was wandb + colorama prints (SURVEY.md
§5). Here metrics go to a JSONL stream (one record per frame/phase) that any
dashboard can tail, wandb is used opportunistically when importable, and the
JAX profiler can be toggled around any phase for XLA-level traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, out_dir: str, use_wandb: bool = False, run_name: str = "enslam"):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project="evennicer-slam-tpu", name=run_name)
            except Exception:
                self._wandb = None

    def log(self, record: Dict[str, Any]):
        record = dict(record, t=time.time())
        self._f.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log(record)

    def close(self):
        self._f.close()


class PhaseTimers:
    """Cumulative wall-clock per phase + per-frame snapshots."""

    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.count[name] += 1

    def summary(self) -> Dict[str, float]:
        out = {}
        for k, v in self.total.items():
            out[f"{k}_total_s"] = round(v, 3)
            if self.count[k]:
                out[f"{k}_mean_ms"] = round(1000 * v / self.count[k], 2)
        return out


@contextlib.contextmanager
def jax_trace(out_dir: Optional[str]):
    """Wrap a phase in a JAX profiler trace (viewable in TensorBoard /
    xprof). No-op when out_dir is None."""
    if not out_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
