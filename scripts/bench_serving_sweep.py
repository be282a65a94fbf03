"""Sweep serving configs on TPU: batch size x (two-program | fused program).

Measures queued steady-state throughput exactly like bench.py (N batches
enqueued FIFO, one sync at the end, np.asarray materialisation).
"""

import time

import jax
import numpy as np

import __graft_entry__ as entry_mod
from mmqg_tpu import decode as DEC


def throughput(run, batch, n=10, warmup=2):
    for _ in range(warmup):
        np.asarray(run())
    t0 = time.perf_counter()
    outs = [run() for _ in range(n)]
    for o in outs:
        np.asarray(o)
    per_batch = (time.perf_counter() - t0) / n
    return batch / per_batch, per_batch * 1e3


def main():
    print("devices:", jax.devices())
    rng = jax.random.PRNGKey(0)
    for batch in (128, 256):
        mc, params, state, arrays = entry_mod._flagship(
            batch=batch, audio_seconds=32)
        params = jax.device_put(params)
        state = jax.device_put(state)
        cap = DEC.audio_bucket(mc, arrays["audio_len"])
        fcap = DEC.frames_bucket(mc, arrays["frames_len"])
        dev = {k: jax.device_put(v) for k, v in arrays.items()}

        def split():
            return DEC.decode_batch(params, state, mc, dev, rng,
                                    strategy="greedy", max_len=21,
                                    use_pallas=True, audio_cap=cap,
                                    frames_cap=fcap)

        def fused():
            return DEC.decode_batch_fused(params, state, mc, dev, rng,
                                          strategy="greedy", max_len=21,
                                          use_pallas=True, audio_cap=cap,
                                          frames_cap=fcap)

        for name, fn in (("split", split), ("fused", fused)):
            try:
                qps, ms = throughput(fn, batch)
                print(f"B={batch:4d} {name:6s} {ms:8.1f} ms/batch "
                      f"{qps:8.1f} q/s")
            except Exception as e:  # noqa: BLE001
                print(f"B={batch:4d} {name:6s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
