"""Composed full-model torch parity at FULL reference dims.

Same check as tests/test_composed_parity.py (shared code: tests/torch_ref.py)
but at the reference's real scale — hidden 512, 3-layer LSTMs, context 283,
AV 101, GloVe-300 embeddings, 112x112 frames, 96x64 mel, 4096-wide VGGish fc
(reference config.py:53,69-86). Runs on CPU (torch is the oracle); takes a
few minutes (the jax encode compile dominates). Result is recorded in
PARITY.md.

Usage: python scripts/composed_parity_full.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

from tests.torch_ref import (Dims, build_composed, check_gradients,  # noqa: E402
                             check_greedy, check_teacher_forced)


def main():
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
