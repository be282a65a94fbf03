"""Would fusing encode+decode help the COALESCED corpus path?

The coalesced joint path dispatches ~2 programs (encode + decode scan) per
bucket group; at corpus shape that is ~6 dispatches x ~27 ms floor ~= 25%
of the 0.64 s wall (PERF.md). `decode_batch_fused` halves the program
count — but an early measurement found a combined program executes
pathologically slower at B=32 (encode_jit docstring), while a later one
found it EQUAL at B=128/256 under queueing. This probe settles it at the
shapes the coalesced path actually dispatches: small row counts (4-16)
at corpus AV buckets.

Run on TPU: python scripts/probe_fused_coalesced.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def main() -> None:
    import jax

    from bench_joint_video import build_pipeline
    from mmqg_tpu import decode as DEC

    pipe = build_pipeline()
    mc = pipe.mc
    rng = np.random.RandomState(0)
    results = []
    # corpus-representative chunk shapes: (rows, frames bucket, audio bucket)
    # — 8 s spans land in the smallest buckets, 19 s in the next
    for rows, fcap, acap in ((4, 12, 8), (8, 12, 8), (16, 25, 25)):
        S = acap * mc.sample_rate  # enough PCM to fill the bucket
        contexts = ["what is the process of the system"] * rows
        frames = [rng.randint(0, 255, (fcap, mc.frame_size, mc.frame_size,
                                       3), np.uint8) for _ in range(rows)]
        audio = [(rng.randn(S) * 3000).astype(np.int16)
                 for _ in range(rows)]
        batch = pipe._pack(contexts, frames, audio, frames_cap=fcap,
                           audio_cap=acap)
        dev = {k: jax.device_put(v) for k, v in batch.items()}
        key = jax.random.PRNGKey(0)

        def split():
            return DEC.decode_batch(pipe.params, pipe.model_state, mc, dev,
                                    key, strategy="greedy", max_len=21,
                                    audio_cap=acap, frames_cap=fcap)

        def fused():
            return DEC.decode_batch_fused(pipe.params, pipe.model_state,
                                          mc, dev, key, strategy="greedy",
                                          max_len=21, audio_cap=acap,
                                          frames_cap=fcap)

        row = {"rows": rows, "frames_cap": fcap, "audio_cap": acap}
        for name, fn in (("split", split), ("fused", fused)):
            t0 = time.perf_counter()
            np.asarray(fn())  # warm (compile)
            row[f"{name}_compile_s"] = round(time.perf_counter() - t0, 1)
            # serial round trips (the coalesced path's dispatch regime:
            # a handful of batches, shallow queue)
            ts = []
            for _ in range(6):
                t0 = time.perf_counter()
                np.asarray(fn())
                ts.append(time.perf_counter() - t0)
            row[f"{name}_serial_ms"] = round(1000 * float(np.median(ts)), 1)
            # queued back-to-back x4, one sync (amortised dispatch)
            t0 = time.perf_counter()
            outs = [fn() for _ in range(4)]
            for o in outs:
                np.asarray(o)
            row[f"{name}_queued_ms"] = round(
                1000 * (time.perf_counter() - t0) / 4, 1)
        row["serial_speedup"] = round(
            row["split_serial_ms"] / row["fused_serial_ms"], 2)
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"summary": [
        (r["rows"], r["serial_speedup"]) for r in results]}))


if __name__ == "__main__":
    main()
