"""Decode-scan decomposition on TPU (round 3): where do the 21-step greedy
decode's ~28 ms at B=128 go, and is there a lever left?

PERF.md per-stage accounting (B=128/cap-37, queued): int8 VGGish 69 ms,
full encode 91 ms, 21-step decode 28 ms — so the decode scan is ~30% of a
served batch. Its per-step FLOPs are tiny (3-layer H=512 LSTM + tri-modal
attention over <=485 slots + a V=2000 projection: ~2 GF/step at B=128,
~10 us of MXU), so 1.3 ms/step must be overhead: weight re-reads per step,
Pallas-vs-XLA attention, the vocab projection, or scan bookkeeping. This
probe times the full scan against ablated variants (zero attention /
no projection / XLA attention / scan unroll 2,4) in ONE process so the
remote-compile queue is paid once.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_decode_tpu.py
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as entry_mod
from mmqg_tpu import decode as DEC
from mmqg_tpu.models import decoder as D
from mmqg_tpu.models import layers as L

B, MAX_LEN = 128, 21


def time_fn(name, fn, *args, iters=8, warmup=2, jit=False):
    f = jax.jit(fn) if jit else fn
    try:
        for _ in range(warmup):
            np.asarray(f(*args))
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(iters)]
        for o in outs:
            np.asarray(o)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:40s} {dt * 1000:8.2f} ms"
              f"  ({dt * 1000 / MAX_LEN:6.3f} ms/step)", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:40s} FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


def main():
    print("devices:", jax.devices(), flush=True)
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
    rng = jax.random.PRNGKey(0)
    emb_table = params["embedding"]["table"]

    zero_ctx = (
        jnp.zeros_like(mem.enc_text[:, 0, :]),
        jnp.zeros_like(mem.enc_audio[:, 0, :]),
        jnp.zeros_like(mem.enc_video[:, 0, :]),
    )

    def zero_attn(p, q, et, ev, ea, tl, vl, al, dtype=jnp.bfloat16):
        return zero_ctx[0], zero_ctx[1], zero_ctx[2], {}

    def make_scan(use_pallas=True, attn_fn=None, project=True, unroll=1):
        def body(carry, t):
            st, tok, fin = carry
            logits, new_state, _ = D.step(params["decoder"], emb_table, tok,
                                          mem, st, train=False,
                                          use_pallas=use_pallas,
                                          dtype=jnp.bfloat16,
                                          project=project, attn_fn=attn_fn)
            if project:
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                # keep the recurrence data-dependent without the projection
                nxt = (jnp.argmax(logits[:, :64], axis=-1) % 100).astype(
                    jnp.int32)
            nxt = jnp.where(fin, 0, nxt)
            fin = fin | (nxt == 2)
            return (new_state, nxt, fin), nxt

        def run(ds):
            init = (ds, jnp.full((B,), 1, jnp.int32), jnp.zeros((B,), bool))
            _, toks = jax.lax.scan(body, init, jnp.arange(MAX_LEN),
                                   unroll=unroll)
            return toks.sum()

        return jax.jit(run)

    # reference point: the real serving scan (decode_from_memories)
    def serving(ds):
        return DEC.decode_from_memories(params, mem, ds, rng,
                                        strategy="greedy", max_len=MAX_LEN,
                                        use_pallas=True, dtype=jnp.bfloat16)

    time_fn("serving decode_from_memories", serving, dec_state)
    time_fn("local scan (pallas attn)", make_scan(True), dec_state)
    time_fn("local scan (xla attn)", make_scan(False), dec_state)
    time_fn("local scan zero-attn", make_scan(True, attn_fn=zero_attn),
            dec_state)
    time_fn("local scan no-projection", make_scan(True, project=False),
            dec_state)
    time_fn("local scan zero-attn no-proj",
            make_scan(True, attn_fn=zero_attn, project=False), dec_state)
    time_fn("local scan unroll=3 (pallas)", make_scan(True, unroll=3),
            dec_state)
    time_fn("local scan unroll=7 (pallas)", make_scan(True, unroll=7),
            dec_state)
    time_fn("local scan unroll=3 (xla)", make_scan(False, unroll=3),
            dec_state)

    # LSTM-step floor: 21 dependent lstm_step calls, no attention/embed/proj
    x_fixed = jnp.zeros(
        (B, params["decoder"]["lstm"]["layers"][0]["wx"].shape[0]),
        jnp.bfloat16)

    def lstm_only(ds):
        def body(st, _):
            top, new_state = L.lstm_step(params["decoder"]["lstm"],
                                         x_fixed + st[0][-1].mean(),
                                         st, dtype=jnp.bfloat16)
            return new_state, top.sum()

        _, outs = jax.lax.scan(body, ds, jnp.arange(MAX_LEN))
        return outs.sum()

    time_fn("lstm_step-only scan (floor)", lstm_only, dec_state, jit=True)


if __name__ == "__main__":
    main()
