"""Composed full-model torch parity at FULL reference dims.

Same check as tests/test_composed_parity.py (shared code: tests/torch_ref.py)
but at the reference's real scale — hidden 512, 3-layer LSTMs, context 283,
AV 101, GloVe-300 embeddings, 112x112 frames, 96x64 mel, 4096-wide VGGish fc
(reference config.py:53,69-86). Runs on CPU (torch is the oracle); takes a
few minutes (the jax encode compile dominates). Result is recorded in
PARITY.md.

Usage: python scripts/composed_parity_full.py
       python scripts/composed_parity_full.py --trajectory 100

--trajectory N: instead of the logits/greedy/gradient checks, run the
END-TO-END training-trajectory equivalence (check_training_equivalence —
per-step loss agreement from a shared init on a shared sample order, the
reference optimizer quirks normalised) for N real Adam steps AT FULL
REFERENCE DIMS. This is the round-3 VERDICT weak #3 bridge: the
to-convergence run (scripts/convergence_parity.py, 1528 steps/side) is at
scaled dims; the full-dims leg was 12 steps; N=100 extends full-dims
agreement past the point where any systematic divergence (wrong decay
handling, drifting state) would compound visibly. The contract is
horizon-aware (see run_trajectory): tight per-step agreement over the
short horizon, coincident descent curves over the long one — per-step f32
reassociation noise grows exponentially on the loss landscape and
saturates by step ~25 (the jax-vs-jax 1-ulp control
scripts/trajectory_noise_control.py diverges identically, so per-step
deltas past that point carry no implementation signal). Per-step deltas
are printed so the drift PROFILE is visible, not just the endpoint bound.
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

from tests.torch_ref import (Dims, build_composed, check_gradients,  # noqa: E402
                             check_greedy, check_teacher_forced)


def run_trajectory(steps: int):
    import numpy as np

    from tests.torch_ref import check_training_equivalence

    d = Dims()  # full reference dims
    print(f"building composed model at reference dims for {steps}-step "
          f"trajectory: V={d.V} H={d.H} ctx={d.CTX_MAX} av={d.AV_MAX}")
    t0 = time.time()
    composed = build_composed(d, seed=0)
    print(f"built + imported in {time.time() - t0:.1f}s")
    t0 = time.time()
    j, t = check_training_equivalence(composed, d, steps=steps, rtol=None,
                                      log=print)
    j, t = np.asarray(j), np.asarray(t)
    rel = np.abs(j - t) / np.abs(t)
    # Horizon-aware contract (measured 2026-08-21, PARITY.md "full-dims
    # trajectory horizon"): per-step agreement is only meaningful over the
    # short horizon — per-step f32 reassociation noise between torch and
    # XLA grows exponentially on the loss landscape (Lyapunov) and
    # SATURATES at the inter-step loss variation by step ~25; the control
    # (scripts/trajectory_noise_control.py: the same jax trainer twice,
    # inits one f32 ulp apart) diverges to the same level, so a blanket
    # 100-step rtol would reject two bit-identical implementations. What a
    # systematic bug would actually move is the loss LEVEL, so the long
    # horizon asserts the descent curves coincide: mean loss over the
    # final fifth of the run.
    short = min(12, steps)
    assert rel[:short].max() < 2e-3, \
        f"short-horizon drift: {rel[:short].max():.2e} at full dims"
    tail = max(steps // 5, 1)
    tail_rel = abs(j[-tail:].mean() - t[-tail:].mean()) / abs(t[-tail:].mean())
    # 3e-3 bound: the measured separation is 3e-4 (PARITY.md "full-dims
    # trajectory horizon"), so 10x headroom still catches a systematic
    # ~0.5-1% loss-level shift the old 1e-2 bound would have passed
    assert tail_rel < 3e-3, f"descent curves separated: {tail_rel:.2e}"
    grow = (rel > 1e-2).argmax() if (rel > 1e-2).any() else None
    print(f"TRAJECTORY AT REFERENCE DIMS: PASS ({steps} steps, "
          f"{time.time() - t0:.1f}s; short-horizon max rel "
          f"{rel[:short].max():.2e} over {short} steps; chaos saturation: "
          f"first step >1e-2 {grow}, median {np.median(rel):.2e}, "
          f"max {rel.max():.2e} at step {int(rel.argmax())}; "
          f"last-{tail}-step mean loss jax {j[-tail:].mean():.4f} "
          f"torch {t[-tail:].mean():.4f} rel {tail_rel:.1e})")


def main():
    if "--trajectory" in sys.argv:
        i = sys.argv.index("--trajectory")
        run_trajectory(int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 100)
        return
    d = Dims()  # defaults = full reference dims
    print(f"building composed model at reference dims: V={d.V} H={d.H} "
          f"ctx={d.CTX_MAX} av={d.AV_MAX} frame={d.FRAME} mel={d.MEL_F}x{d.MEL_B}")
    t0 = time.time()
    composed = build_composed(d, seed=0)
    print(f"built + imported in {time.time() - t0:.1f}s")

    t0 = time.time()
    worst = check_teacher_forced(composed, d, atol=5e-4, log=print)
    print(f"teacher-forced parity OK in {time.time() - t0:.1f}s "
          f"(max |logit delta| = {worst:.2e})")

    t0 = time.time()
    toks = check_greedy(composed, d, log=print)
    print(f"greedy parity OK in {time.time() - t0:.1f}s; tokens:\n{toks}")

    t0 = time.time()
    # full-dims grads: looser rtol than the CI test — f32 reductions over
    # 4096-wide VGGish fc layers accumulate more rounding
    check_gradients(composed, d, rtol=5e-3, atol=1e-5, log=print)
    print(f"gradient parity OK in {time.time() - t0:.1f}s")
    print("COMPOSED PARITY AT REFERENCE DIMS: PASS")


if __name__ == "__main__":
    main()
