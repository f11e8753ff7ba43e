"""Tracing/profiling helpers.

The reference scatters jax.profiler.start_trace/stop_trace calls through its
__main__ blocks (base_env.py:467-484, marl_env.py:860-934). Here: a context
manager, a fusion-time summariser that parses the chrome trace (no
TensorBoard needed), and a device-memory snapshot.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
from contextlib import contextmanager
from typing import Dict, List, Tuple

import jax


@contextmanager
def trace(log_dir: str = "/tmp/jaxmarl-hft-trace"):
    """jax.profiler trace context (TPU + host)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def summarize_trace(log_dir: str, top: int = 20
                    ) -> List[Tuple[str, int, float]]:
    """Aggregate (name, count, total_ms) of device ops from the newest trace
    under log_dir, sorted by total time."""
    acc: Dict[str, List[float]] = {}
    for fl in glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                        recursive=True):
        with gzip.open(fl) as fh:
            data = json.load(fh)
        for e in data.get("traceEvents", []):
            if e.get("ph") == "X" and "dur" in e:
                nm = e.get("name", "")
                acc.setdefault(nm, [0, 0.0])
                acc[nm][0] += 1
                acc[nm][1] += e["dur"]
    rows = sorted(((nm, int(c), d / 1e3) for nm, (c, d) in acc.items()),
                  key=lambda r: -r[2])
    return rows[:top]


def device_memory_stats() -> Dict[str, int]:
    """Per-device live memory (bytes) where the backend exposes it."""
    stats = {}
    for d in jax.devices():
        try:
            ms = d.memory_stats()
            stats[str(d)] = ms.get("bytes_in_use", -1)
        except Exception:
            stats[str(d)] = -1
    return stats
