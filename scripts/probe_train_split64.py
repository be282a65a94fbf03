"""Per-modality forward/backward split of the BUCKETED train step at B=64
(the production operating point, PERF.md training table) — determines
whether any training-side optimisation headroom remains or the step is at
the conv stack's measured XLA ceiling."""

import time

import jax
import numpy as np

import __graft_entry__ as entry_mod
from mmqg_tpu import decode as DEC
from mmqg_tpu.config import Config
from mmqg_tpu.models import qg_model
from mmqg_tpu.train import init_train_state, make_optimizer


def timeit(fn, *args, n=6):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        np.asarray(jax.tree.leaves(o)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    # trimodal at B=32: the UNDONATED fwd+bwd (grads+params coexisting, no
    # buffer reuse) does not fit 16 GB HBM at B=64 — the donated full train
    # step does (PERF.md training table), which is the point of donation
    for mode, B in (("text", 64), ("text_video", 64), ("trimodal", 32)):
        mc0, _, _, arrays = entry_mod._flagship(batch=B, audio_seconds=32)
        emb = np.zeros((mc0.n_vocab, mc0.word_emb_dim), np.float32)
        optimizer = make_optimizer(Config())
        arrays["target_len"] = np.maximum(arrays["target_len"], 1)
        dev = {k: jax.device_put(v) for k, v in arrays.items()}
        acap = DEC.audio_bucket(mc0, arrays["audio_len"])
        fcap = DEC.frames_bucket(mc0, arrays["frames_len"])
        mc = mc0._replace(mode=mode)
        print(f"mode={mode} B={B} acap={acap} fcap={fcap}", flush=True)
        ts = jax.device_put(init_train_state(jax.random.PRNGKey(0), mc, emb,
                                             optimizer))
        rng = jax.random.PRNGKey(1)
        a = acap if mode == "trimodal" else None
        f = fcap if mode != "text" else None

        def fwd(params, model_state, batch, rng):
            return qg_model.loss_fn(params, model_state, mc, batch,
                                    train=True, dropout_rng=rng,
                                    audio_cap=a,
                                    frames_cap=f)[0]
        fwd_j = jax.jit(fwd)

        def vg(params, model_state, batch, rng):
            def lf(p):
                return qg_model.loss_fn(p, model_state, mc, batch,
                                        train=True, dropout_rng=rng,
                                        audio_cap=a,
                                        frames_cap=f)
            (loss, _), grads = jax.value_and_grad(lf, has_aux=True)(params)
            return loss, grads
        vg_j = jax.jit(vg)

        ms_f = timeit(fwd_j, ts["params"], ts["model_state"], dev, rng)
        ms_b = timeit(vg_j, ts["params"], ts["model_state"], dev, rng)
        # full-step numbers live in PERF.md (bench_train_sweep.py); holding
        # a second train state here OOMs the trimodal B=64 case
        print(f"mode={mode:11s} fwd={ms_f:7.1f}  fwd+bwd={ms_b:7.1f} "
              f"(bwd/fwd={(ms_b - ms_f) / max(ms_f, 1e-9):.2f})",
              flush=True)
        del ts
        fwd_j.clear_cache()
        vg_j.clear_cache()


if __name__ == "__main__":
    main()
