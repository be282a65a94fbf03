"""Minimal repro hunt for the intermittent XLA:CPU abort seen in
test_parallel.test_train_step_on_mesh (float() of a mesh-sharded donated
train step's metrics aborts the process, no diagnostic).

Runs mesh train steps many times across mesh shapes; toggle donation with
MMQG_REPRO_NO_DONATE=1. Exits 0 if all iterations survive.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# ROOT CAUSE (found via this script, 2026-08-17): XLA:CPU's in-process
# collective rendezvous (rendezvous.cc) LOG(FATAL)s after a 40 s termination
# timeout when any of the 8 virtual-device threads is starved — trivially
# reproduced on this 1-core box by running anything else concurrently, and
# intermittently by the suite's own compiles. Fix: raise
# --xla_cpu_collective_call_terminate_timeout_seconds (tests/conftest.py).
# Set MMQG_REPRO_RAISE_TIMEOUTS=1 to verify the fixed configuration here.
if os.environ.get("MMQG_REPRO_RAISE_TIMEOUTS"):
    os.environ["XLA_FLAGS"] += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_timeout_seconds=1200")

import jax

jax.config.update("jax_platforms", "cpu")

from functools import partial

import jax.numpy as jnp
import numpy as np
import optax

from mmqg_tpu.models import qg_model
from mmqg_tpu.parallel import make_mesh, shard_batch, shard_params


def main():
    donate = not os.environ.get("MMQG_REPRO_NO_DONATE")
    n_iter = int(os.environ.get("MMQG_REPRO_ITERS", "12"))
    from mmqg_tpu.models.video_encoder import flatten_dim_for

    mc = qg_model.ModelConfig(
        n_vocab=64, word_emb_dim=8, hidden_dim=16, text_layers=2,
        dec_layers=2, video_hidden_dim=16, audio_emb_dim=8,
        flatten_dim=flatten_dim_for(16),
        context_max_length=24, av_max_length=8, target_steps=6,
        mode="trimodal", frame_size=16, mel_frames=16, mel_bins=16,
        sample_rate=1600, stft_window=64, stft_hop=32)
    emb = np.random.RandomState(0).randn(64, 8).astype(np.float32)
    params, state = qg_model.init(jax.random.PRNGKey(0), mc, emb)
    # host copies: donation below deletes device buffers between meshes
    params = jax.tree.map(np.asarray, params)
    state = jax.tree.map(np.asarray, state)
    opt = optax.adam(1e-3)

    B = 8
    rs = np.random.RandomState(1)
    batch = {
        "context_ids": rs.randint(3, 64, (B, 24)).astype(np.int32),
        "context_len": np.full((B,), 24, np.int32),
        "frames": rs.randint(0, 255, (B, 8, 16, 16, 3)).astype(np.uint8),
        "frames_len": np.full((B,), 8, np.int32),
        "audio_pcm": (rs.randn(B, 1600 * 2) * 3000).astype(np.int16),
        "audio_len": np.full((B,), 1600 * 2, np.int32),
        "target_ids": rs.randint(3, 64, (B, 6)).astype(np.int32),
        "target_len": np.full((B,), 6, np.int32),
        "valid": np.ones((B,), bool),
    }

    def make_step():
        def step(ts, b, rng):
            def lf(p):
                return qg_model.loss_fn(p, ts["model_state"], mc, b,
                                        train=True, dropout_rng=rng)
            (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(
                ts["params"])
            updates, new_opt = opt.update(grads, ts["opt_state"],
                                          ts["params"])
            new_params = optax.apply_updates(ts["params"], updates)
            return {"params": new_params, "model_state": aux.get(
                "model_state", ts["model_state"]), "opt_state": new_opt}, loss
        if donate:
            return jax.jit(step, donate_argnums=(0,))
        return jax.jit(step)

    print(f"donate={donate} iters/mesh={n_iter}")
    for shape in ((8, 1), (4, 2), (2, 4), (8, 1), (4, 2), (2, 4)):
        mesh = make_mesh(shape)
        ts = {"params": shard_params(params, mesh),
              "model_state": jax.tree.map(jnp.asarray, state),
              "opt_state": shard_params(opt.init(params), mesh)}
        sb = shard_batch(batch, mesh)
        step = make_step()
        for i in range(n_iter):
            ts, loss = step(ts, sb, jax.random.PRNGKey(i))
            v = float(loss)
        print(f"mesh {shape}: ok, last loss {v:.4f}", flush=True)
    print("SURVIVED")


if __name__ == "__main__":
    main()
