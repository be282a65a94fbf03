"""Chaos control for the full-dims training-trajectory comparison
(scripts/composed_parity_full.py --trajectory): run the SAME jitted
trainer twice from inits differing by one relative float32 ulp (~6e-8) on
every parameter, identical sample order, and log the per-step loss
rel-delta.

Interpretation: two bit-identical implementations that differ only in
floating-point summation order inject ~ulp-level noise per step; on a
chaotic loss landscape that noise grows exponentially (Lyapunov), so
per-step loss deltas between ANY two honest trainers — including this
self-vs-self pair — grow with horizon. If the torch-vs-jax trajectory's
drift grows at the same rate as this jax-vs-jax control, the drift is
floating-point chaos amplified by the landscape, NOT an implementation
difference; a systematic bug would show as a drift rate ABOVE the control's
or as divergence to a different loss level. Endpoint-level equivalence is
covered separately by the trained-to-convergence run
(scripts/convergence_parity.py; PARITY.md).

Usage: python scripts/trajectory_noise_control.py [steps] [rel_eps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(steps: int = 100, rel_eps: float = 6e-8):
    import optax

    from mmqg_tpu.train import make_train_step
    from tests.torch_ref import Dims, build_composed

    d = Dims()
    print(f"building composed model at reference dims (control twin, "
          f"{steps} steps, rel_eps={rel_eps:g})")
    t0 = time.time()
    modules, mc, params, state, batch = build_composed(d, seed=0)
    print(f"built in {time.time() - t0:.1f}s")

    opt = optax.adam(1e-3)
    step_fn = make_train_step(mc, opt, dtype=jnp.float32, donate=False)

    def trainer(p):
        return {"params": p, "model_state": state,
                "opt_state": opt.init(p), "step": jnp.zeros((), jnp.int32)}

    ts_a = trainer(params)
    ts_b = trainer(jax.tree.map(
        lambda x: (x * (1.0 + rel_eps)).astype(x.dtype), params))

    B = batch["target_ids"].shape[0]
    rng = jax.random.PRNGKey(3)  # same order as check_training_equivalence
    rel = []
    t0 = time.time()
    for s in range(steps):
        b = s % B
        sample = {k: np.asarray(v[b:b + 1]) for k, v in batch.items()}
        placed = jax.device_put(sample)
        key = jax.random.fold_in(rng, s)
        ts_a, m_a = step_fn(ts_a, placed, key)
        ts_b, m_b = step_fn(ts_b, placed, key)
        la, lb = float(m_a["loss"]), float(m_b["loss"])
        rel.append(abs(la - lb) / abs(lb))
        print(f"step {s}: a {la:.6f} b {lb:.6f} rel {rel[-1]:.2e}",
              flush=True)
    rel = np.array(rel)
    print(f"CONTROL ({steps} steps, {time.time() - t0:.0f}s): per-step "
          f"loss rel-delta median {np.median(rel):.2e}, max {rel.max():.2e}"
          f" at step {int(rel.argmax())}; first step >1e-3: "
          f"{int(np.argmax(rel > 1e-3)) if (rel > 1e-3).any() else 'never'};"
          f" first step >1e-2: "
          f"{int(np.argmax(rel > 1e-2)) if (rel > 1e-2).any() else 'never'}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100,
         float(sys.argv[2]) if len(sys.argv) > 2 else 6e-8)
