"""Round-3 TPU measurement batch (one process — remote compile amortised):

A. int8 VGGish serving path MXU utilisation (round-2 VERDICT weak #2: the
   bf16 37% figure was the only one logged) + bf16 comparison at the same
   shapes, with the exact FLOP count printed.
B. The "fuse log-mel into the VGGish program" lever: serving ALREADY runs
   them in one program (qg_model.encode inside decode.encode_jit — the
   per-stage numbers in PERF.md are standalone probe programs, each paying
   its own ~27 ms dispatch floor). This measures the one-program vs
   two-program composition explicitly so the close-out is a measurement,
   not an assertion.
C. ops/lstm_train_pallas at H=2048 (round-2 VERDICT weak #4: its
   "wins at larger hidden sizes" justification was asserted, not measured;
   PERF.md records equality at H=512 only). fwd+bwd vs jax.grad through
   the XLA scan at H in {512, 2048}.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_round3_tpu.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(name, fn, *args, iters=6, warmup=2, flops=None, jit=True):
    f = jax.jit(fn) if jit else fn
    try:
        for _ in range(warmup):
            np.asarray(f(*args))
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(iters)]
        for o in outs:
            np.asarray(o)
        dt = (time.perf_counter() - t0) / iters
        extra = f"  {flops / dt / 1e12:7.1f} Tops/s" if flops else ""
        print(f"{name:34s} {dt * 1000:8.2f} ms{extra}", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:34s} FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


def vggish_flops_per_example() -> float:
    """conv1..conv4b + fc1..fc3 multiply-add FLOPs for one 96x64 example."""
    convs = [  # (H, W, Cin, Cout) at the conv INPUT resolution
        (96, 64, 1, 64), (48, 32, 64, 128), (24, 16, 128, 256),
        (24, 16, 256, 256), (12, 8, 256, 512), (12, 8, 512, 512)]
    f = sum(2 * h * w * ci * co * 9 for h, w, ci, co in convs)
    f += 2 * (6 * 4 * 512) * 4096 + 2 * 4096 * 4096 + 2 * 4096 * 128
    return float(f)


def probe_vggish_mxu():
    from mmqg_tpu.models import audio_encoder

    print("== A. VGGish serving-path MXU utilisation (N=2048 examples) ==")
    params = jax.device_put(audio_encoder.init(jax.random.PRNGKey(0)))
    N = 2048
    mel = jnp.asarray(np.random.RandomState(0).randn(N, 96, 64), jnp.float32)
    fl = vggish_flops_per_example() * N
    print(f"FLOPs: {vggish_flops_per_example() / 1e9:.3f} GF/example, "
          f"{fl / 1e12:.2f} TF at N={N}")

    def bf16(p, m):
        return audio_encoder.embed_examples(p, m, dtype=jnp.bfloat16).sum()

    def int8(p, m):
        return audio_encoder.embed_examples_int8(
            p, m, dtype=jnp.bfloat16).sum()

    d_bf = time_fn("vggish_bf16_full_stack", bf16, params, mel, flops=fl)
    d_i8 = time_fn("vggish_int8_full_stack", int8, params, mel, flops=fl)
    peak = 197e12  # v5e bf16 peak (PERF.md MXU characterisation)
    if d_bf:
        print(f"  bf16: {fl / d_bf / peak * 100:.1f}% of bf16 peak")
    if d_i8:
        print(f"  int8: {fl / d_i8 / peak * 100:.1f}% of bf16 peak "
              f"(int8 dots run at bf16 rate on this compiler — PERF.md)")


def probe_mel_fusion():
    from mmqg_tpu.models import audio_encoder, frontends

    print("== B. log-mel + VGGish: one program vs two (B=128 x 32 s) ==")
    params = jax.device_put(audio_encoder.init(jax.random.PRNGKey(0)))
    B, seconds, cap = 128, 32, 40
    pcm = jnp.asarray(
        (np.random.RandomState(0).randn(B, seconds * 16000) * 3000)
        .astype(np.int16))

    def mel_of(p):
        return frontends.log_mel_examples(p, max_examples=cap,
                                          dtype=jnp.bfloat16)

    def fused(par, p):
        mel = mel_of(p)
        flat = mel.reshape((-1,) + mel.shape[2:])
        return audio_encoder.embed_examples_int8(
            par, flat, dtype=jnp.bfloat16).sum()

    mel_jit = jax.jit(mel_of)
    emb_jit = jax.jit(lambda par, m: audio_encoder.embed_examples_int8(
        par, m.reshape((-1,) + m.shape[2:]), dtype=jnp.bfloat16).sum())

    def two_programs(par, p):
        return emb_jit(par, mel_jit(p))

    time_fn("one_program (serving path)", fused, params, pcm)
    time_fn("two_programs (mel | vggish)", two_programs, params, pcm,
            jit=False)


def probe_lstm_h2048():
    import mmqg_tpu.ops.lstm_train_pallas as K
    from mmqg_tpu.models import layers as L

    print("== C. trainable Pallas LSTM vs XLA scan, fwd+bwd ==")
    for H in (512, 2048):
        B, T = 32, 283
        params = L.lstm_init(jax.random.PRNGKey(0), H, H, 1)
        layer = jax.device_put(params["layers"][0])
        xs = jnp.asarray(np.random.RandomState(0).randn(B, T, H),
                         jnp.float32)
        h0 = jnp.zeros((B, H))
        c0 = jnp.zeros((B, H))
        # 8 gate GEMMs per step fwd; bwd ~2x
        fl = 2 * B * T * (H * 4 * H * 2) * 3

        def loss_pallas(wx, wh, b):
            out, _, hT, _ = K.lstm_layer_train(wx, wh, b, xs, h0, c0,
                                               "bfloat16")
            return (out.astype(jnp.float32) ** 2).sum() + (hT ** 2).sum()

        def loss_scan(wx, wh, b):
            p = {"layers": [{"wx": wx, "wh": wh, "b": b}]}
            out, (hT, _) = L.lstm_scan(p, xs, dtype=jnp.bfloat16)
            return (out.astype(jnp.float32) ** 2).sum() + (
                hT[0].astype(jnp.float32) ** 2).sum()

        def g_pallas(wx, wh, b):
            return jax.tree.map(
                lambda x: x.sum(),
                jax.grad(loss_pallas, argnums=(0, 1, 2))(wx, wh, b))

        def g_scan(wx, wh, b):
            return jax.tree.map(
                lambda x: x.sum(),
                jax.grad(loss_scan, argnums=(0, 1, 2))(wx, wh, b))

        time_fn(f"xla_scan_fwdbwd_H{H}", g_scan,
                layer["wx"], layer["wh"], layer["b"], flops=fl, iters=4)
        time_fn(f"pallas_train_fwdbwd_H{H}", g_pallas,
                layer["wx"], layer["wh"], layer["b"], flops=fl, iters=4)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    probe_vggish_mxu()
    probe_mel_fusion()
    probe_lstm_h2048()
