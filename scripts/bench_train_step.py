"""Training-step timing on TPU at reference dims (PERF.md training table).

Measures the jitted train step (teacher-forced loss + grads + Adam) for each
mode at batch 32, queued iterations, np.asarray sync.
"""

import time

import jax
import numpy as np

import __graft_entry__ as entry_mod
from mmqg_tpu.config import Config
from mmqg_tpu.train import batch_arrays, init_train_state, make_optimizer, make_train_step


def main():
    print("devices:", jax.devices())
    B = 32
    for mode in ("text", "text_video", "trimodal"):
        mc, params, state, arrays = entry_mod._flagship(
            batch=B, audio_seconds=32)
        mc = mc._replace(mode=mode)
        import mmqg_tpu.models.qg_model as qg
        emb = np.zeros((mc.n_vocab, mc.word_emb_dim), np.float32)
        optimizer = make_optimizer(Config())
        ts = init_train_state(jax.random.PRNGKey(0), mc, emb, optimizer)
        ts = jax.device_put(ts)
        arrays["target_len"] = np.maximum(arrays["target_len"], 1)
        dev = {k: jax.device_put(v) for k, v in arrays.items()}
        from mmqg_tpu import decode as DEC

        variants = [("uncapped", None, None)]
        if mode == "trimodal":
            av = mc.av_max_length
            need = min(DEC.audio_examples_needed(mc, arrays["audio_len"]), av)
            acap = next(b for b in (av // 4, av // 2, (3 * av) // 4, av)
                        if need <= b)
            variants.append((f"bucketed acap={acap}", acap, av))
        for label, acap, fcap in variants:
            ts = jax.device_put(init_train_state(jax.random.PRNGKey(0), mc,
                                                 emb, optimizer))
            step = make_train_step(mc, optimizer, use_pallas=False,
                                   audio_cap=acap, frames_cap=fcap)
            rng = jax.random.PRNGKey(1)
            ts, m = step(ts, dev, rng)         # compile
            np.asarray(m["loss"])
            n = 6
            t0 = time.perf_counter()
            for i in range(n):
                ts, m = step(ts, dev, jax.random.fold_in(rng, i))
            np.asarray(m["loss"])
            ms = (time.perf_counter() - t0) / n * 1e3
            print(f"mode={mode:11s} {label:20s} step {ms:8.1f} ms  "
                  f"{B / ms * 1e3:7.1f} samples/s")


if __name__ == "__main__":
    main()
