"""Fused one-program encode+decode vs the two-program split at SMALL batch
— the coalesced corpus-serving regime (2-3 bucket groups of ~8-32 rows,
PERF.md "Cross-video coalescing"), where the ~27 ms per-program dispatch
floor is proportionally largest.

Round-3 close-out measured fused == split at B=128 UNDER QUEUEING (the
second dispatch amortises to ~1 ms while the device chews the first
program). At small batches the device finishes before the host's next RPC,
so the floor may NOT amortise — this probe times both compositions at
B=16/32 with corpus-shaped AV caps, in both disciplines:
  queued  — dispatch N calls back-to-back, materialise at the end
            (the generate_async pattern the coalesced path uses)
  latency — materialise each call (a single group's submit->ready time)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fused_smallbatch.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

import __graft_entry__ as entry_mod
from mmqg_tpu import decode as DEC

MAX_LEN = 21


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = jax.random.PRNGKey(0)
    for B in (16, 32):
        mc, params, state, batch_arrays = entry_mod._flagship(
            batch=B, audio_seconds=12)  # ~corpus p50 span + slack
        # corpus-shaped request rows: ~12 sampled frames (p50 8 s span at
        # ~1 fps + slack), short PCM — what the coalesced path actually
        # ships per row (model av_max stays 101; encode pads memories on
        # device, PERF.md "Request-payload note")
        T = 12
        batch_arrays["frames"] = batch_arrays["frames"][:, :T]
        batch_arrays["frames_len"] = np.full((B,), T, np.int32)
        cap = DEC.audio_bucket(mc, batch_arrays["audio_len"])
        fcap = DEC.frames_bucket(mc, batch_arrays["frames_len"])
        params = jax.device_put(params)
        state = jax.device_put(state)
        dev = {k: jax.device_put(v) for k, v in batch_arrays.items()}

        def split():
            return DEC.decode_batch(params, state, mc, dev, rng,
                                    max_len=MAX_LEN, audio_cap=cap,
                                    frames_cap=fcap)

        def fused():
            return DEC.decode_batch_fused(params, state, mc, dev, rng,
                                          max_len=MAX_LEN, audio_cap=cap,
                                          frames_cap=fcap)

        # warm both programs (compiles excluded), check agreement
        s = np.asarray(split())
        f = np.asarray(fused())
        assert np.array_equal(s, f), "fused tokens != split tokens"

        for name, fn in (("split", split), ("fused", fused)):
            # queued: N dispatches, one materialise
            N = 8
            t0 = time.perf_counter()
            outs = [fn() for _ in range(N)]
            for o in outs:
                np.asarray(o)
            q = (time.perf_counter() - t0) / N
            # latency: materialise each
            t0 = time.perf_counter()
            for _ in range(N):
                np.asarray(fn())
            l = (time.perf_counter() - t0) / N
            print(f"B={B:3d} cap={cap}/{fcap} {name}: "
                  f"queued {1000 * q:7.2f} ms/call "
                  f"({B / q:6.0f} q/s), latency {1000 * l:7.2f} ms/call",
                  flush=True)


if __name__ == "__main__":
    main()
