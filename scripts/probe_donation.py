"""Donation cost characterisation on TPU (PERF.md "Donation characterisation"):
full train step with donate_argnums on vs off across batch/accum configs."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, numpy as np
import __graft_entry__ as entry_mod
from mmqg_tpu import decode as DEC
from mmqg_tpu.config import Config
from mmqg_tpu.models import qg_model
from mmqg_tpu.train import init_train_state, make_optimizer
print("backend:", jax.default_backend(), flush=True)

import optax
from functools import partial

def run(B, A, donate):
    mc, params, state, arrays = entry_mod._flagship(batch=B, audio_seconds=32)
    emb = np.zeros((mc.n_vocab, mc.word_emb_dim), np.float32)
    optimizer = make_optimizer(Config())
    arrays["target_len"] = np.maximum(arrays["target_len"], 1)
    dev = {k: jax.device_put(v) for k, v in arrays.items()}
    av = mc.av_max_length
    need = min(DEC.audio_examples_needed(mc, arrays["audio_len"]), av)
    acap = DEC._bucket(max(1, need), av)
    fcap = DEC.frames_bucket(mc, arrays["frames_len"])

    def body(train_state, batch, rng):
        if A == 1:
            def lf(p):
                return qg_model.loss_fn(p, train_state["model_state"], mc, batch,
                                        train=True, dropout_rng=rng, audio_cap=acap, frames_cap=fcap)
            (obj, aux), grads = jax.value_and_grad(lf, has_aux=True)(train_state["params"])
        else:
            micro = {k: v.reshape((A, B // A) + v.shape[1:]) for k, v in batch.items()}
            rngs = jax.random.split(rng, A)
            p0 = train_state["params"]
            g0 = jax.tree.map(jax.numpy.zeros_like, p0)
            def sbody(carry, xs):
                g_acc, ms = carry
                mb, r = xs
                def lf(p):
                    return qg_model.loss_fn(p, ms, mc, mb, train=True,
                                            dropout_rng=r, audio_cap=acap, frames_cap=fcap)
                (o, aux), g = jax.value_and_grad(lf, has_aux=True)(p0)
                return (jax.tree.map(lambda a, b: a + b, g_acc, g), aux["state"]), o
            (grads, new_ms), objs = jax.lax.scan(sbody, (g0, train_state["model_state"]), (micro, rngs))
            grads = jax.tree.map(lambda g: g / A, grads)
            obj = objs.mean()
            aux = {"state": new_ms}
        updates, opt_state = optimizer.update(grads, train_state["opt_state"], train_state["params"])
        new_params = optax.apply_updates(train_state["params"], updates)
        return {"params": new_params, "model_state": aux["state"],
                "opt_state": opt_state, "step": train_state["step"] + 1}, obj

    step = (jax.jit(body, donate_argnums=(0,)) if donate else jax.jit(body))
    try:
        ts = jax.device_put(init_train_state(jax.random.PRNGKey(0), mc, emb, optimizer))
        rng = jax.random.PRNGKey(1)
        ts, loss = step(ts, dev, rng)
        np.asarray(loss)
        n = 6
        t0 = time.perf_counter()
        for i in range(n):
            ts, loss = step(ts, dev, jax.random.fold_in(rng, i))
        np.asarray(loss)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"B={B} A={A} donate={donate}: {ms:.1f} ms  {B/ms*1e3:.1f} samples/s", flush=True)
        del ts
    except Exception as e:
        print(f"B={B} A={A} donate={donate}: FAIL {type(e).__name__} {str(e)[:120]}", flush=True)
    del dev

run(64, 1, False)
run(128, 2, False)

run(64, 2, False)
run(96, 3, False)
run(64, 2, True)
