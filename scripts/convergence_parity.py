"""Trained-to-convergence equivalence runner (round-2 VERDICT missing #3).

Reference-style torch training (per-sample loop, Adam — reference
train.py:131-218) vs our jitted trainer, SAME init, SAME sample order, on a
learnable rule corpus at scaled dims, run to convergence; final val loss
and final greedy-decode BLEU (evaluate.py:107-126 semantics) are compared.
The shared machinery lives in tests/torch_ref.py::check_convergence_
equivalence — the CI test (tests/test_composed_parity.py::
test_composed_convergence_equivalence) runs the same check with a smaller
epoch budget; THIS script is the full run whose numbers PARITY.md records.

Usage: python scripts/convergence_parity.py [max_epochs] [lr]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

from tests.torch_ref import (Dims, build_composed,  # noqa: E402
                             check_convergence_equivalence)

# TGT=4 -> 3-token question bodies. Longer bodies were tried (TGT=6, for a
# non-degenerate 4-gram BLEU) and rejected by measurement: free-running
# decode never becomes exact at these dims (teacher-forced CE plateaus
# ~1.0/token; greedy decode compounds rung-skips, val BLEU 0 on BOTH sides
# even after a 2-phase lr drop) — trajectory-equivalent but an empty
# convergence claim. At TGT=4 the model measurably reaches EXACT val
# decodes by ~epoch 200 at lr 5e-3 (per-token CE ~0.27), so the endpoint
# compares BLEU-1/2/3 = 1.0 + 4/4 exact matches; 4-gram BLEU is degenerate
# on 3-token bodies (documented in the check).
DIMS = Dims(V=40, EMB=8, H=16, NL=1, HV=16, HA=8, CTX_MAX=12, AV_MAX=4,
            TGT=4, FRAME=45, MEL_F=32, MEL_B=32, RATE=1600, WIN=64, HOP=32)


def main():
    max_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    # default = the exact configuration PARITY.md's recorded run used
    # (lr 5e-3 reached exact val decodes at epoch 191): a bare
    # `python scripts/convergence_parity.py` reproduces those numbers
    lr = float(sys.argv[2]) if len(sys.argv) > 2 else 5e-3
    composed = build_composed(DIMS, seed=0, tame_audio=True)
    t0 = time.time()
    out = check_convergence_equivalence(
        composed, DIMS, n_train=8, n_val=4, max_epochs=max_epochs, lr=lr,
        # 0.28/token is the measured exact-decode threshold at these dims
        # (jax-only scout: val decodes all exact at per-token CE <=0.27);
        # the plateau rule is the backstop if a future change slows descent
        stop_loss=0.28,
        log=lambda *a: print(*a, flush=True))
    print(f"RESULT ({time.time() - t0:.0f}s):")
    for k, v in out.items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
