"""LR calibration for the convergence-parity run (jax side only).

check_convergence_equivalence's two sides track each other to 4 decimals
(PARITY.md trajectory leg), so the cheap jax-only trainer is a faithful
proxy for picking the lr/epoch budget at which the TORCH side will clear
stop_loss. Runs the identical step order (batch-1, fold_in(ep*n+b)) on the
identical rule corpus and reports epochs-to-threshold per lr.

Usage: python scripts/calibrate_convergence_lr.py [max_epochs]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from mmqg_tpu.train import make_train_step  # noqa: E402
from tests.torch_ref import Dims, build_composed, make_rule_batch  # noqa: E402

DIMS = Dims(V=40, EMB=8, H=16, NL=1, HV=16, HA=8, CTX_MAX=12, AV_MAX=4,
            TGT=4, FRAME=45, MEL_F=32, MEL_B=32, RATE=1600, WIN=64, HOP=32)


def run(lr, max_epochs, stop_loss=0.05, n_train=8):
    composed = build_composed(DIMS, seed=0, tame_audio=True)
    _, mc, params, state, _ = composed
    train_b = make_rule_batch(DIMS, n_train, seed=11)
    opt = optax.adam(lr)
    ts = {"params": params, "model_state": state,
          "opt_state": opt.init(params), "step": jnp.zeros((), jnp.int32)}
    step_fn = make_train_step(mc, opt, dtype=jnp.float32, donate=False)
    rng = jax.random.PRNGKey(3)
    hist = []
    for ep in range(max_epochs):
        s = 0.0
        for b in range(n_train):
            sample = {k: np.asarray(v[b:b + 1]) for k, v in train_b.items()}
            ts, mets = step_fn(ts, jax.device_put(sample),
                               jax.random.fold_in(rng, ep * n_train + b))
            s += float(mets["loss"])
        hist.append(s / n_train)
        if hist[-1] < stop_loss:
            return ep + 1, hist
        if not np.isfinite(hist[-1]):
            return -1, hist
    return 0, hist


def main():
    max_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    for lr in (3e-3, 5e-3, 1e-2, 2e-2, 5e-2):
        t0 = time.time()
        eps, hist = run(lr, max_epochs)
        tail = ", ".join(f"{h:.3f}" for h in hist[-3:])
        status = (f"CONVERGED at epoch {eps}" if eps > 0 else
                  ("DIVERGED" if eps < 0 else f"not under 0.05 in {max_epochs}"))
        print(f"lr={lr:g}: {status}  last=[{tail}]  ({time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
