"""Benchmark harness: end-to-end questions/sec/chip (preproc + decode).

Measures the flagship tri-modal pipeline at reference dims (context 283,
AV 101, question 21, hidden 512) doing exactly what the reference's
evaluate.py did per question — video/audio/text encode + 21-step greedy
decode — but batched, jitted, and on-device (including the log-mel frontend
and frame normalisation; H2D transfer is inside the timed region).

Baseline: BASELINE_MEASURED.json (reference-style batch-1 torch CPU pipeline,
see scripts/measure_baseline.py; the reference itself publishes no numbers —
BASELINE.md). Prints ONE json line:
  {"metric": ..., "value": N, "unit": "questions/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent


def _load_baseline() -> float:
    path = REPO / "BASELINE_MEASURED.json"
    if path.exists():
        with open(path) as f:
            return float(json.load(f)["questions_per_sec_cpu_reference"])
    # conservative default from scripts/measure_baseline.py on this image
    return 0.2956


def main() -> None:
    import jax

    import __graft_entry__ as entry_mod
    from mmqg_tpu import decode as DEC

    backend = jax.default_backend()
    batch = 32
    audio_seconds = 32
    warmup, iters = 2, 5

    mc, params, state, batch_arrays = entry_mod._flagship(
        batch=batch, audio_seconds=audio_seconds)

    rng = jax.random.PRNGKey(0)
    use_pallas = backend not in ("cpu",)

    def run_once():
        dev_batch = {k: jax.device_put(v) for k, v in batch_arrays.items()}
        toks = DEC.decode_batch(params, state, mc, dev_batch, rng,
                                strategy="greedy", max_len=21,
                                use_pallas=use_pallas)
        jax.block_until_ready(toks)
        return toks

    for _ in range(warmup):
        run_once()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)

    sec_per_batch = float(np.median(times))
    qps = batch / sec_per_batch
    baseline = _load_baseline()
    result = {
        "metric": "questions/sec/chip end-to-end (preproc+decode)",
        "value": round(qps, 2),
        "unit": "questions/sec/chip",
        "vs_baseline": round(qps / baseline, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
