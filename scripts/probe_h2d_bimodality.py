"""One-time h2d tunnel characterisation (round-4 VERDICT weak #5): WHY is
the host->device bandwidth probe bimodal?

bench.py's 17-probe trimmed median has carried spreads of 0.73-1.36 across
rounds. This probe takes N back-to-back transfers of a fixed payload,
records each probe's wall time AND timestamp, then:
  * prints the sorted samples + a coarse histogram,
  * splits the samples at the largest sorted-gap into two modes and
    reports each mode's median + occupancy,
  * reports how the slow probes CLUSTER in time (runs-test style: number
    of slow->slow adjacencies vs the expectation under independence) —
    temporal clustering means congestion EPISODES on the shared tunnel,
    not per-transfer noise.

Run on TPU with a quiet host (the serialization half of device_put is CPU
work): python scripts/probe_h2d_bimodality.py [n_probes] [payload_mb]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(n_probes: int = 60, payload_mb: int = 64) -> None:
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    payload = rng.randint(0, 255, (payload_mb * 1_000_000,), np.uint8)
    probe = jax.jit(lambda t: t.ravel()[0].astype(jnp.float32))
    np.asarray(probe(jax.device_put(payload)))  # warm the program

    samples, stamps = [], []
    t_start = time.perf_counter()
    for _ in range(n_probes):
        t0 = time.perf_counter()
        np.asarray(probe(jax.device_put(payload)))
        t1 = time.perf_counter()
        samples.append(payload.nbytes / 1e6 / (t1 - t0))
        stamps.append(t0 - t_start)
    s = np.array(samples)

    srt = np.sort(s)
    gaps = np.diff(srt)
    cut_i = int(np.argmax(gaps))
    thresh = (srt[cut_i] + srt[cut_i + 1]) / 2
    slow = s < thresh
    n_slow = int(slow.sum())

    # runs test: adjacent slow-slow pairs vs independence expectation
    adj = int(np.sum(slow[:-1] & slow[1:]))
    p_slow = n_slow / len(s)
    exp_adj = (len(s) - 1) * p_slow * p_slow

    hist, edges = np.histogram(s, bins=10)
    out = {
        "n_probes": n_probes,
        "payload_mb": payload_mb,
        "samples_mb_s": [round(x, 1) for x in samples],
        "stamps_s": [round(x, 1) for x in stamps],
        "median_mb_s": round(float(np.median(s)), 1),
        "mode_split_mb_s": round(float(thresh), 1),
        "fast_mode": {"n": len(s) - n_slow,
                      "median_mb_s": round(float(np.median(s[~slow])), 1)},
        "slow_mode": {"n": n_slow,
                      "median_mb_s": round(float(np.median(s[slow])), 1)
                      if n_slow else None},
        "slow_adjacent_pairs": adj,
        "slow_adjacent_expected_if_independent": round(exp_adj, 1),
        "histogram": {"counts": hist.tolist(),
                      "edges_mb_s": [round(float(e), 1) for e in edges]},
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if not a.startswith("-")]
    main(n_probes=int(argv[0]) if argv else 60,
         payload_mb=int(argv[1]) if len(argv) > 1 else 64)
