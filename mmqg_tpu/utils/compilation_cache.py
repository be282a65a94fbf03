"""Persistent XLA compilation cache.

The reference re-runs everything from scratch each process (no compiled
artifacts to cache — eager torch). On TPU the dominant cold-start cost is
XLA compilation: on this environment's remote-compile backend a large
program takes 30 s–10 min (PERF.md "Measurement discipline"), and the
measured eighth-granularity AV-bucket policy deliberately trades ~2× compile
count for an 8% steady-state win *because* a persistent cache amortises it
(PERF.md "Training bucket granularity A/B"). This module is that cache:
point it at a directory and every jitted program (train-step bucket
variants, encode/decode programs, serving graphs) is compiled once per
machine instead of once per process.

Enabled by ``Config.compilation_cache_dir`` (all CLIs), the
``--compile-cache DIR`` driver flag, or the ``MMQG_COMPILE_CACHE`` env var;
precedence: flag > env > config.

Backend caveat (measured): this environment's remote-compile *axon* tunnel
backend does not produce serialisable executables, so the cache never hits
across processes HERE (.claude/skills/verify/SKILL.md gotchas) — it is
harmless (writes nothing it can't use) and pays off on standard PJRT
TPU/CPU hosts, where executable serialisation is supported (verified on
the CPU backend in tests/test_compile_cache.py).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Union


def enable_compilation_cache(cache_dir: Union[str, Path],
                             min_compile_secs: float = 1.0) -> Path:
    """Turn on JAX's persistent compilation cache rooted at ``cache_dir``.

    Safe to call before or after JAX has initialised (config updates apply to
    subsequent compiles). Programs compiling faster than ``min_compile_secs``
    are not persisted — caching a 50 ms CPU compile costs more in disk I/O
    than it saves; the remote-TPU compiles this exists for are >> 1 s.
    """
    path = Path(cache_dir).expanduser()
    path.mkdir(parents=True, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


def resolve_cache_dir(flag_value: Optional[str],
                      config_value: str = "") -> Optional[str]:
    """flag > MMQG_COMPILE_CACHE env > config; '' / None means disabled."""
    return (flag_value or os.environ.get("MMQG_COMPILE_CACHE")
            or config_value or None)


def maybe_enable_from(flag_value: Optional[str], config) -> Optional[Path]:
    """Driver helper: resolve and enable in one call; no-op when unset."""
    target = resolve_cache_dir(flag_value,
                               getattr(config, "compilation_cache_dir", ""))
    if not target:
        return None
    return enable_compilation_cache(target)
