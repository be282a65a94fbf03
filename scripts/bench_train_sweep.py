"""Training-throughput sweep on TPU: trimodal bucketed step at B=32/64/128.

Finds where samples/s tops out (PERF.md training table was measured at B=32
only). Bucketed AV caps, queued iterations, np.asarray sync.
"""

import time

import jax
import numpy as np

import __graft_entry__ as entry_mod
from mmqg_tpu import decode as DEC
from mmqg_tpu.config import Config
from mmqg_tpu.train import init_train_state, make_optimizer, make_train_step


def main():
    print("devices:", jax.devices(), flush=True)
    for mode in ("trimodal", "text_video"):
        for B in (32, 64, 128):
            mc, params, state, arrays = entry_mod._flagship(
                batch=B, audio_seconds=32)
            mc = mc._replace(mode=mode)
            emb = np.zeros((mc.n_vocab, mc.word_emb_dim), np.float32)
            optimizer = make_optimizer(Config())
            arrays["target_len"] = np.maximum(arrays["target_len"], 1)
            dev = {k: jax.device_put(v) for k, v in arrays.items()}
            av = mc.av_max_length
            acap = None
            if mode == "trimodal":
                need = min(DEC.audio_examples_needed(mc, arrays["audio_len"]),
                           av)
                acap = DEC._bucket(max(1, need), av)
            fcap = DEC.frames_bucket(mc, arrays["frames_len"])
            try:
                ts = jax.device_put(init_train_state(jax.random.PRNGKey(0),
                                                     mc, emb, optimizer))
                step = make_train_step(mc, optimizer, use_pallas=False,
                                       audio_cap=acap, frames_cap=fcap)
                rng = jax.random.PRNGKey(1)
                ts, m = step(ts, dev, rng)
                np.asarray(m["loss"])
                n = 6
                t0 = time.perf_counter()
                for i in range(n):
                    ts, m = step(ts, dev, jax.random.fold_in(rng, i))
                np.asarray(m["loss"])
                ms = (time.perf_counter() - t0) / n * 1e3
                print(f"mode={mode:11s} B={B:4d} acap={acap} fcap={fcap} "
                      f"step {ms:8.1f} ms  {B / ms * 1e3:7.1f} samples/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"mode={mode:11s} B={B:4d} FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
