"""Metrics logging and timing.

The reference logs through WandB via io_callback (ippo_rnn_JAXMARL.py:1067)
and computes end-to-end steps/sec under a Timing flag (:1202-1236). Here:
a dependency-free JSONL metrics logger with the same information content,
an optional wandb passthrough when the package is importable, and a timing
context.
"""
from __future__ import annotations

import json
import time
from contextlib import contextmanager
from typing import Any, Dict, Optional

import numpy as np


def _to_py(x):
    if isinstance(x, dict):
        return {k: _to_py(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_to_py(v) for v in x]
    if hasattr(x, "item") and getattr(x, "size", 2) == 1:
        return x.item()
    if isinstance(x, np.ndarray):
        return x.tolist()
    return x


class MetricsLogger:
    """JSONL metrics sink with optional wandb mirroring."""

    def __init__(self, path: Optional[str] = None, use_wandb: bool = False,
                 wandb_kwargs: Optional[Dict[str, Any]] = None):
        self._f = open(path, "a") if path else None
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(**(wandb_kwargs or {}))
            except ImportError:
                pass

    @property
    def wandb_active(self) -> bool:
        """True iff wandb mirroring is actually running (the constructor
        degrades silently when the package is missing — callers that were
        EXPLICITLY asked to mirror should check and fail loudly)."""
        return self._wandb is not None

    def log(self, step: int, metrics: Dict[str, Any]):
        payload = {"step": step, "ts": time.time(), **_to_py(metrics)}
        if self._f:
            self._f.write(json.dumps(payload) + "\n")
            self._f.flush()
        if self._wandb:
            self._wandb.log(_to_py(metrics), step=step)
        return payload

    def close(self):
        if self._f:
            self._f.close()
        if self._wandb:
            self._wandb.finish()


class Throughput:
    """Steps/sec tracker (reference Timing flag semantics: total env steps /
    elapsed wall clock)."""

    def __init__(self):
        self.t0 = time.time()
        self.steps = 0

    def update(self, n_steps: int) -> float:
        self.steps += n_steps
        return self.steps / (time.time() - self.t0)


@contextmanager
def timed(label: str = "", sink=print):
    t0 = time.time()
    yield
    sink(f"{label}: {time.time() - t0:.3f}s")
