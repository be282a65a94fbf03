"""Profiling hooks (SURVEY.md §5 tracing: the reference had only tqdm bars,
train.py:143; TPU equivalent is jax.profiler traces + named annotations).

Also the debug toggles standing in for the reference's (commented-out)
``torch.autograd.set_detect_anomaly`` (non_attn_train.py:104): jit-level NaN
checking via ``jax.config.jax_debug_nans``.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Path) -> Iterator[None]:
    """Capture a perfetto/tensorboard trace of the enclosed block:
    ``with profiling.trace('/tmp/trace'): step(...)``"""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler traces (decorator or ctx-manager)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def nan_debugging(enable: bool = True) -> Iterator[None]:
    """Sanitizer toggle: re-runs any jit producing NaNs in op-by-op mode and
    raises at the offending primitive."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StepTimer:
    """Wall-clock per-step timing with sync (np.asarray-forced) sampling every
    ``sync_every`` steps — async dispatch makes naive timing meaningless."""

    def __init__(self, sync_every: int = 10):
        self.sync_every = sync_every
        self.samples = []
        self._count = 0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> Optional[float]:
        import numpy as np

        self._count += 1
        if self._count % self.sync_every == 0 and result is not None:
            np.asarray(jax.tree.leaves(result)[0])
            dt = time.perf_counter() - self._t0
            self.samples.append(dt / self.sync_every)
            self._t0 = time.perf_counter()
            return self.samples[-1]
        return None

    @property
    def median(self) -> float:
        import numpy as np

        return float(np.median(self.samples)) if self.samples else float("nan")


def param_mem_mb(tree) -> float:
    """Parameter/buffer memory of a pytree in MB — the reference's
    ``get_mem_usage`` (reference train.py:49-53, call sites commented out at
    train.py:295-297) rebuilt for pytrees."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "nbytes"):
            total += leaf.nbytes
        elif hasattr(leaf, "size") and hasattr(leaf, "dtype"):
            total += leaf.size * leaf.dtype.itemsize
    return total / (1024 * 1024)


def device_memory_report() -> dict:
    """Per-device live-buffer usage in MB (HBM on TPU). Complements
    ``param_mem_mb``: this is what is actually resident, including
    activations and donated buffers not yet freed."""
    report = {}
    for d in jax.devices():
        stats = None
        try:
            stats = d.memory_stats()
        except Exception:
            pass
        if stats:
            report[str(d)] = {
                "bytes_in_use_mb": stats.get("bytes_in_use", 0) / 1e6,
                "peak_bytes_mb": stats.get("peak_bytes_in_use", 0) / 1e6,
            }
            continue
        # backends without memory_stats (CPU returns None): count live
        # buffers (jax.Array.device is a PROPERTY, not a method)
        live = 0
        if hasattr(d, "client"):
            for b in d.client.live_buffers():
                dev = getattr(b, "device", None)
                dev = dev() if callable(dev) else dev
                if dev == d:
                    live += b.nbytes
        report[str(d)] = {"bytes_in_use_mb": live / 1e6}
    return report
