"""Scale-out tour: every parallelism feature on one 8-device mesh.

The reference (ksg14/multi-modal-qg) is single-CPU batch-1 with no
distributed code at all (SURVEY.md §2 C26-C28); this demo walks the
TPU-native scaling surface this framework adds:

  1. data parallelism            — batch over the "data" axis, grads psum
  2. tensor parallelism          — LSTM gates / vocab / attention heads over "model"
  3. training sequence parallel  — context axis of the text memory over "model"
  4. ZeRO-1                      — Adam moments 1/dp over "data"
  5. FSDP / ZeRO-3               — the parameters themselves 1/dp over "data"
  6. SP serving decode           — token-identical to the unsharded decode

It runs anywhere: with fewer than 8 real devices it bootstraps 8 virtual
CPU devices (the same mechanism the test suite and the driver's multichip
dry run use); on a real v5e-8 the bootstrap is a no-op and the same code
lays the mesh over the chips. Per-device memory for the optimizer+param
state is printed for replicated vs ZeRO-1 vs FSDP so the 1/dp claim is
visible, not asserted. Usage:  python examples/scale_out.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mmqg_tpu.parallel.bootstrap import force_virtual_cpu_devices  # noqa: E402

force_virtual_cpu_devices(8)  # no-op when >= 8 real devices are present

import jax                                                  # noqa: E402
import jax.numpy as jnp                                     # noqa: E402

from mmqg_tpu.config import Config                          # noqa: E402
from mmqg_tpu.models import qg_model                        # noqa: E402
from mmqg_tpu.models.video_encoder import flatten_dim_for   # noqa: E402
from mmqg_tpu.parallel import (                             # noqa: E402
    make_mesh, shard_batch, shard_opt_state, shard_params, shard_params_fsdp)
from mmqg_tpu.parallel.mesh import (                        # noqa: E402
    fsdp_shardings, param_shardings, sp_greedy_decode, zero1_shardings)
from mmqg_tpu.train import (                                # noqa: E402
    init_train_state, make_optimizer, make_train_step)


def device_bytes(tree) -> int:
    """Bytes this PROCESS's device 0 holds for the tree (its shard sizes)."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            total += leaf.addressable_shards[0].data.nbytes
    return total


def main() -> None:
    frame_size = 32
    config = Config(
        glove_emb_dim=8, batch_size=16, question_max_length=6,
        context_max_length=16, av_max_length=3, frame_size=frame_size,
        flatten_dim=flatten_dim_for(frame_size), video_hidden_dim=16,
        text_lstm_hidden_dim=16, text_lstm_layers=2, dec_lstm_hidden_dim=16,
        dec_lstm_layers=2, audio_emb=8, audio_sample_rate=1600,
        stft_window=64, stft_hop=32, mel_bins=16, mel_frames_per_example=16,
        use_pallas=False)
    n_vocab = 64
    mc = qg_model.ModelConfig.from_config(config, n_vocab=n_vocab,
                                          mode="trimodal")
    rng = np.random.RandomState(0)
    emb = rng.randn(n_vocab, mc.word_emb_dim).astype(np.float32)
    optimizer = make_optimizer(config)
    ts = init_train_state(jax.random.PRNGKey(0), mc, emb, optimizer)
    host = jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "ndim") else x, ts)

    B, S = config.batch_size, 2 * config.audio_sample_rate
    batch = {
        "context_ids": rng.randint(3, n_vocab, (B, 16)).astype(np.int32),
        "context_len": np.full((B,), 16, np.int32),
        "frames": rng.randint(0, 255, (B, 3, frame_size, frame_size, 3)).astype(np.uint8),
        "frames_len": np.full((B,), 3, np.int32),
        "audio_pcm": (rng.randn(B, S) * 3000).astype(np.int16),
        "audio_len": np.full((B,), S, np.int32),
        "target_ids": rng.randint(3, n_vocab, (B, 7)).astype(np.int32),
        "target_len": np.full((B,), 7, np.int32),
        "valid": np.ones((B,), bool),
    }

    def fresh(param_placer, opt_placer):
        # the train step donates its inputs, so every run starts from the
        # host snapshot (same rng -> every variant computes the same step)
        return {
            "params": param_placer(host["params"]),
            "model_state": jax.tree.map(jnp.asarray, host["model_state"]),
            "opt_state": opt_placer(host["opt_state"]),
            "step": jnp.asarray(host["step"]),
        }

    # ---- 1+2: DP x TP mesh --------------------------------------------
    mesh = make_mesh((4, 2))  # 4-way data, 2-way model
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} over "
          f"{len(jax.devices())} {jax.devices()[0].platform} devices")
    sbatch = shard_batch(batch, mesh)

    tp_place = lambda t: shard_params(t, mesh)              # noqa: E731
    ts_dp = fresh(tp_place, tp_place)
    bytes_repl = device_bytes(ts_dp["params"]) + device_bytes(ts_dp["opt_state"])
    step = make_train_step(mc, optimizer, use_pallas=False)
    ts_dp, metrics = step(ts_dp, sbatch, jax.random.PRNGKey(1))
    print(f"1+2. DPxTP train step: loss={float(metrics['loss']):.4f} "
          f"(grads psum over 'data', TP gathers over 'model' — all emitted "
          f"by GSPMD)")

    # ---- 3: training-side sequence parallelism ------------------------
    step_sp = make_train_step(mc, optimizer, use_pallas=False, sp_mesh=mesh)
    _, m_sp = step_sp(fresh(tp_place, tp_place), sbatch,
                      jax.random.PRNGKey(1))
    print(f"3.   train step with context-sharded text memory (SP): "
          f"loss={float(m_sp['loss']):.4f} (same step, same loss)")

    # ---- 4: ZeRO-1 ------------------------------------------------------
    z_place = lambda t: shard_opt_state(t, mesh, zero1=True)  # noqa: E731
    shardings_z = {"params": param_shardings(host["params"], mesh),
                   "opt_state": zero1_shardings(host["opt_state"], mesh)}
    ts_z = fresh(tp_place, z_place)
    bytes_z = device_bytes(ts_z["params"]) + device_bytes(ts_z["opt_state"])
    step_z = make_train_step(mc, optimizer, use_pallas=False,
                             state_shardings=shardings_z)
    ts_z, m_z = step_z(ts_z, sbatch, jax.random.PRNGKey(1))
    print(f"4.   ZeRO-1 step: loss={float(m_z['loss']):.4f}")

    # ---- 5: FSDP / ZeRO-3 ----------------------------------------------
    shardings_f = {"params": fsdp_shardings(host["params"], mesh),
                   "opt_state": zero1_shardings(host["opt_state"], mesh)}
    ts_f = fresh(lambda t: shard_params_fsdp(t, mesh), z_place)
    bytes_f = device_bytes(ts_f["params"]) + device_bytes(ts_f["opt_state"])
    step_f = make_train_step(mc, optimizer, use_pallas=False,
                             state_shardings=shardings_f)
    ts_f, m_f = step_f(ts_f, sbatch, jax.random.PRNGKey(1))
    print(f"5.   FSDP step:   loss={float(m_f['loss']):.4f}")
    print(f"     params+opt bytes on device 0: replicated {bytes_repl:,} "
          f"-> ZeRO-1 {bytes_z:,} -> FSDP {bytes_f:,}")

    # ---- 6: SP serving decode (token-identical) ------------------------
    from mmqg_tpu import decode as DEC
    toks = np.asarray(DEC.decode_batch(
        ts_f["params"], ts_f["model_state"], mc, sbatch,
        jax.random.PRNGKey(2), strategy="greedy", max_len=4,
        use_pallas=False))
    toks_sp = np.asarray(sp_greedy_decode(
        ts_f["params"], ts_f["model_state"], mc, sbatch, mesh,
        max_len=4, rng_seed=2))
    assert (toks == toks_sp).all()
    print(f"6.   SP greedy decode == unsharded decode "
          f"(shape {toks.shape}, token-identical)")
    print("done — the same code lays these meshes over real chips; "
          "the train CLI flags are --data-parallel --sequence-parallel "
          "--zero1 --fsdp")


if __name__ == "__main__":
    main()
