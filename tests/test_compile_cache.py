"""Persistent compilation cache (utils/compilation_cache.py).

The reference has nothing to cache (eager torch); here the cold-start cost
is XLA compilation (30 s–10 min per large program on the remote-compile
backend — PERF.md), so the cache is a first-class serving/training feature.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mmqg_tpu.utils.compilation_cache import (
    enable_compilation_cache, maybe_enable_from, resolve_cache_dir)


def test_resolve_precedence(monkeypatch):
    monkeypatch.delenv("MMQG_COMPILE_CACHE", raising=False)
    assert resolve_cache_dir(None, "") is None
    assert resolve_cache_dir(None, "cfg") == "cfg"
    monkeypatch.setenv("MMQG_COMPILE_CACHE", "env")
    assert resolve_cache_dir(None, "cfg") == "env"
    assert resolve_cache_dir("flag", "cfg") == "flag"


def test_maybe_enable_noop_when_unset(monkeypatch):
    monkeypatch.delenv("MMQG_COMPILE_CACHE", raising=False)

    class Cfg:
        compilation_cache_dir = ""

    assert maybe_enable_from(None, Cfg()) is None


def test_cache_entries_written(tmp_path):
    cache = tmp_path / "xla_cache"
    try:
        enable_compilation_cache(cache, min_compile_secs=0.0)

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x.T).sum() * 3.0

        np.asarray(f(np.ones((64, 64), np.float32)))
        entries = list(cache.iterdir())
        assert entries, "no cache entries written"
    finally:
        # the cache dir is process-global jax config; detach it so later
        # tests don't write into this (soon-garbage-collected) tmp dir
        jax.config.update("jax_compilation_cache_dir", None)


def test_config_knob_round_trips(tmp_path):
    from mmqg_tpu.config import Config
    cfg = Config(compilation_cache_dir=str(tmp_path / "cc"),
                 output_path=tmp_path / "out", data_path=tmp_path / "data")
    cfg.ensure_dirs()
    cfg.save()
    loaded = Config.load(os.path.join(cfg.output_path, "config.json"))
    assert loaded.compilation_cache_dir == str(tmp_path / "cc")
