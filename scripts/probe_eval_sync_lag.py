"""Measure the evaluate/validate loop's per-batch sync overhead on TPU.

evaluate.evaluate and Trainer.validate used to block on np.asarray/to_host
after every dispatched batch — a device->host round trip (~30 ms on this
tunnel backend) serialising the host loop (token detokenisation + BLEU)
with device compute. Both now run through utils/pipelining.pipelined with
lag=2. This probe A/Bs the two disciplines on the real greedy decode
program with a staged trimodal batch, finalizing each batch exactly like
evaluate does (np.asarray + tokens_to_words).

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_eval_sync_lag.py
"""

import time

import jax
import numpy as np

import __graft_entry__ as entry_mod
from mmqg_tpu import decode as DEC
from mmqg_tpu.utils.pipelining import pipelined

B = 32
ITERS = 16


def main():
    mc, params, state, batch_arrays = entry_mod._flagship(batch=B,
                                                          audio_seconds=32)
    params = jax.device_put(params)
    state = jax.device_put(state)
    cap = DEC.audio_bucket(mc, batch_arrays["audio_len"])
    fcap = DEC.frames_bucket(mc, batch_arrays["frames_len"])
    dev_batch = {k: jax.device_put(v) for k, v in batch_arrays.items()}
    index_to_word = {str(i): f"w{i}" for i in range(mc.n_vocab)}
    rng = jax.random.PRNGKey(0)

    def dispatch(i):
        return DEC.decode_batch(params, state, mc, dev_batch, rng,
                                strategy="greedy", max_len=21,
                                audio_cap=cap, frames_cap=fcap)

    def finalize(toks, i):
        return DEC.tokens_to_words(np.asarray(toks), index_to_word)

    # warm compile outside the clock
    finalize(dispatch(0), 0)

    for name, lag in [("sync_every_batch", 0), ("lag2", 2),
                      ("lag2_again", 2), ("sync_again", 0)]:
        t0 = time.monotonic()
        n = 0
        for words in pipelined(range(ITERS), dispatch, finalize, lag=lag):
            n += len(words)
        dt = (time.monotonic() - t0) / ITERS
        print(f"{name}: {dt*1e3:.1f} ms/batch ({B/dt:.0f} q/s)")


if __name__ == "__main__":
    main()
