"""Decode-scan scaling on TPU (round 3, follow-up to probe_decode_tpu.py).

probe_decode_tpu found the 21-step greedy decode's ~26 ms at B=128 is ALL
in the bare dependent LSTM recurrence (zero-attn / no-proj ablations are
free; lstm_step-only floor = the full scan). 26 ms / 21 steps = 1.24 ms per
step, ~75x the HBM bound for re-reading the 12.6 MB of bf16 LSTM weights.
This probe disambiguates WHAT the 26 ms is proportional to:

  1. batch:   B in {32, 64, 128, 256} at 21 steps — compute/bandwidth would
              scale with B; per-step launch overhead would not.
  2. steps:   42-step scan at B=128 — per-step overhead scales 2x.
  3. program: K in {1, 2, 4} decode scans CHAINED inside ONE jitted program
              (state threaded through) — a per-program floor stays ~26 ms;
              a per-step cost scales with K.

Verdict drives whether a fused whole-decode Pallas kernel (weights
VMEM-resident across steps, like ops/lstm_pallas.py does for the encoder)
can pay, or the 26 ms is this backend's per-step floor.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_decode_scaling.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as entry_mod
from mmqg_tpu import decode as DEC


def time_fn(name, fn, *args, iters=8, warmup=2):
    try:
        for _ in range(warmup):
            np.asarray(fn(*args))
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        for o in outs:
            np.asarray(o)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:44s} {dt * 1000:8.2f} ms", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


def setup(B):
    mc, params, state, batch_arrays = entry_mod._flagship(
        batch=B, audio_seconds=32)
    params = jax.device_put(params)
    state = jax.device_put(state)
    cap = DEC.audio_bucket(mc, batch_arrays["audio_len"])
    fcap = DEC.frames_bucket(mc, batch_arrays["frames_len"])
    dev_batch = {k: jax.device_put(v) for k, v in batch_arrays.items()}
    mem, dec_state = DEC.encode_jit(params, state, mc, dev_batch, True, cap,
                                    fcap, jnp.bfloat16)
    mem = jax.block_until_ready(mem)
    return params, mem, dec_state


def main():
    print("devices:", jax.devices(), flush=True)
    rng = jax.random.PRNGKey(0)

    # 1. batch scaling at 21 steps
    for B in (32, 64, 128, 256):
        params, mem, dec_state = setup(B)

        def run(ds, params=params, mem=mem):
            return DEC.decode_from_memories(params, mem, ds, rng,
                                            strategy="greedy", max_len=21,
                                            use_pallas=True,
                                            dtype=jnp.bfloat16)

        time_fn(f"decode 21 steps B={B}", run, dec_state)

    # 2. step scaling at B=128
    params, mem, dec_state = setup(128)
    for steps in (21, 42):
        def run(ds, steps=steps):
            return DEC.decode_from_memories(params, mem, ds, rng,
                                            strategy="greedy",
                                            max_len=steps, use_pallas=True,
                                            dtype=jnp.bfloat16)

        time_fn(f"decode {steps} steps B=128", run, dec_state)

    # 3. K chained scans in one program (per-program vs per-step cost)
    from mmqg_tpu.models import decoder as D

    emb_table = params["embedding"]["table"]

    def make_chained(K):
        def one_scan(ds, seed_tok):
            def body(carry, t):
                st, tok = carry
                logits, new_state, _ = D.step(params["decoder"], emb_table,
                                              tok, mem, st, train=False,
                                              use_pallas=True,
                                              dtype=jnp.bfloat16)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (new_state, nxt), nxt

            (_, last), toks = jax.lax.scan(body, (ds, seed_tok),
                                           jnp.arange(21))
            return last, toks.sum()

        def run(ds):
            tok = jnp.full((mem.enc_text.shape[0],), 1, jnp.int32)
            tot = jnp.zeros((), jnp.int32)
            for _ in range(K):
                tok, s = one_scan(ds, tok)
                tot = tot + s
            return tot

        return jax.jit(run)

    for K in (1, 2, 4):
        time_fn(f"one program, K={K} chained 21-step scans",
                make_chained(K), dec_state)


if __name__ == "__main__":
    main()
