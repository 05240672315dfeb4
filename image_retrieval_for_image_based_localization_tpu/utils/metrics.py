"""Structured metrics + profiling (SURVEY.md §5 tracing/observability).

The reference prints loss/mAP to stdout; here metrics stream as JSONL
records (host-side, cheap) and device phases are wrapped in
``jax.profiler`` traces on demand.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    """Append-only JSONL metrics writer; also mirrors to stdout optionally."""

    def __init__(self, path: Optional[str] = None, echo: bool = False):
        self.path = path
        self.echo = echo
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, **record: Any) -> Dict[str, Any]:
        record.setdefault("t", time.time())
        line = json.dumps(record)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        if self.echo:
            print(line, flush=True)
        return record


@contextlib.contextmanager
def phase_timer(name: str, logger: Optional[MetricsLogger] = None, items: int = 0):
    """Wall-clock a device phase; caller must block_until_ready inside."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    rec = {"phase": name, "seconds": dt}
    if items:
        rec["items_per_sec"] = items / dt
    if logger:
        logger.log(**rec)


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/irtpu_trace", enabled: bool = True):
    """jax.profiler trace around a region (perfetto dump in ``logdir``)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def percentile_summary(lat_seconds, unit: str = "ms") -> dict:
    """p50/p95/p99/mean summary of latencies given in SECONDS, emitted in
    ``unit`` ('ms' or 's') — the one shared implementation behind serving's
    /statz window and the bench harnesses."""
    import numpy as np

    lat = np.asarray(lat_seconds, np.float64)
    scale = 1e3 if unit == "ms" else 1.0
    return {
        f"p50_{unit}": round(float(np.percentile(lat, 50)) * scale, 2),
        f"p95_{unit}": round(float(np.percentile(lat, 95)) * scale, 2),
        f"p99_{unit}": round(float(np.percentile(lat, 99)) * scale, 2),
        f"mean_{unit}": round(float(lat.mean()) * scale, 2),
    }
