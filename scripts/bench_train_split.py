"""Forward/backward/optimizer split of the trimodal train step on TPU."""

import time

import jax
import numpy as np

import __graft_entry__ as entry_mod
from mmqg_tpu.config import Config
from mmqg_tpu.models import qg_model
from mmqg_tpu.train import init_train_state, make_optimizer, make_train_step


def timeit(fn, *args, n=6):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        np.asarray(jax.tree.leaves(o)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("devices:", jax.devices())
    B = 32
    mc, params, state, arrays = entry_mod._flagship(batch=B, audio_seconds=32)
    emb = np.zeros((mc.n_vocab, mc.word_emb_dim), np.float32)
    optimizer = make_optimizer(Config())
    ts = jax.device_put(init_train_state(jax.random.PRNGKey(0), mc, emb,
                                         optimizer))
    dev = {k: jax.device_put(v) for k, v in arrays.items()}
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def fwd(params, model_state, batch, rng):
        return qg_model.loss_fn(params, model_state, mc, batch, train=True,
                                dropout_rng=rng)[0]

    ms = timeit(fwd, ts["params"], ts["model_state"], dev, rng)
    print(f"forward loss            {ms:8.1f} ms")

    @jax.jit
    def vg(params, model_state, batch, rng):
        def lf(p):
            return qg_model.loss_fn(p, model_state, mc, batch, train=True,
                                    dropout_rng=rng)
        (loss, _), grads = jax.value_and_grad(lf, has_aux=True)(params)
        return loss, grads

    ms = timeit(vg, ts["params"], ts["model_state"], dev, rng)
    print(f"forward+backward        {ms:8.1f} ms")

    step = make_train_step(mc, optimizer)
    ts2 = jax.device_put(jax.tree.map(np.asarray, ts))
    ts2, m = step(ts2, dev, rng)
    np.asarray(m["loss"])
    n = 6
    t0 = time.perf_counter()
    for i in range(n):
        ts2, m = step(ts2, dev, jax.random.fold_in(rng, i))
    np.asarray(m["loss"])
    print(f"full step (+Adam)       {(time.perf_counter() - t0) / n * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
