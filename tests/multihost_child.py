"""Child process of tests/test_multihost.py.

Joins a REAL multi-process JAX runtime (gloo CPU collectives — the CI
stand-in for DCN between TPU hosts/slices, SURVEY.md §5 "Distributed
communication backend"), then checks that training math on a mesh spanning
both processes matches locally-computed single-device math:

* loss and global gradient norm (f32) of the text QG model on the
  cross-process (data, model) mesh vs. one local device — a missing or
  double-counted cross-process psum shifts the gradient norm O(1);
* one full donated train step (make_train_step) executes on the mesh and
  yields a finite, process-consistent loss;
* batch assembly goes through the production path
  (pad_and_shard_batch -> assemble_global_batch), each process
  contributing only its own row block.

Prints MULTIHOST_OK on success; any assertion/exception exits nonzero.
"""

import sys


def main() -> int:
    coordinator, nprocs, pid, config_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    from mmqg_tpu.parallel.multihost import initialize_multihost
    initialize_multihost(coordinator, nprocs, pid,
                         virtual_cpu_devices_per_process=4)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == 4 * nprocs, jax.device_count()
    assert len(jax.local_devices()) == 4

    from mmqg_tpu.config import Config
    from mmqg_tpu.data.dataset import QGDataset
    from mmqg_tpu.models import qg_model
    from mmqg_tpu.parallel import make_mesh, pad_and_shard_batch
    from mmqg_tpu.parallel.multihost import (is_primary, replicate_global,
                                             shard_params_global, to_host)
    from mmqg_tpu.train import (batch_arrays, init_train_state,
                                make_optimizer, make_train_step)

    cfg = Config.load(config_path)
    ds = QGDataset(cfg, cfg.train_file, load_media=False)
    emb = np.load(cfg.weights_matrix_file).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(cfg, n_vocab=len(ds.vocab),
                                          mode="text")
    optimizer = make_optimizer(cfg)
    ts = init_train_state(jax.random.PRNGKey(0), mc, emb, optimizer)
    ts_host = jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "ndim") else x, ts)
    batch = batch_arrays(next(ds.batches(8)))

    @jax.jit
    def loss_and_gnorm(params, model_state, b):
        def lf(p):
            return qg_model.loss_fn(p, model_state, mc, b, train=True,
                                    dropout_rng=None, dtype=jnp.float32)
        (loss, _), g = jax.value_and_grad(lf, has_aux=True)(params)
        return loss, optax.global_norm(g)

    # local single-device reference (plain host arrays -> local device 0)
    loss1, gnorm1 = loss_and_gnorm(ts_host["params"], ts_host["model_state"],
                                   batch)
    loss1, gnorm1 = float(loss1), float(gnorm1)

    # cross-process mesh: all 8 devices on the data axis
    mesh = make_mesh()
    params_g = shard_params_global(ts_host["params"], mesh)
    state_g = replicate_global(ts_host["model_state"], mesh)
    sbatch = pad_and_shard_batch(dict(batch), mesh)
    lossN, gnormN = loss_and_gnorm(params_g, state_g, sbatch)
    lossN, gnormN = float(lossN), float(gnormN)  # fully-replicated scalars

    rel_loss = abs(lossN - loss1) / max(abs(loss1), 1e-12)
    rel_gnorm = abs(gnormN - gnorm1) / max(abs(gnorm1), 1e-12)
    assert rel_loss < 1e-4, (loss1, lossN)
    assert rel_gnorm < 1e-4, (gnorm1, gnormN)

    # full donated train step on the cross-process mesh
    ts_g = {
        "params": params_g,
        "model_state": state_g,
        "opt_state": shard_params_global(ts_host["opt_state"], mesh),
        "step": replicate_global(ts_host["step"], mesh),
    }
    step_fn = make_train_step(mc, optimizer)
    new_ts, metrics = step_fn(ts_g, sbatch, jax.random.PRNGKey(1))
    step_loss = float(metrics["loss"])
    assert np.isfinite(step_loss), step_loss

    # to_host round-trips a batch-sharded global array (cross-process gather)
    gathered = to_host(sbatch["context_ids"])
    np.testing.assert_array_equal(gathered, batch["context_ids"])

    # --- per-process SHARDED loading: each process packs media only for its
    # own row block (StreamingLoader local_rows); the assembled global batch
    # must still carry every row's real media — each taken from its owner.
    from mmqg_tpu.data.streaming import StreamingLoader
    from mmqg_tpu.parallel.multihost import (
        global_max_int, loader_local_rows, local_row_range)

    B = 8
    lo, hi = local_row_range(mesh, B)
    assert (lo, hi) == ((0, 4) if pid == 0 else (4, 8)), (lo, hi)
    assert loader_local_rows(mesh, B) == (lo, hi)
    # non-divisible batch: the range is computed on the padded size and
    # clipped to the real batch (padded rows are synthesized, never loaded)
    assert loader_local_rows(mesh, 6) == ((0, 4) if pid == 0 else (4, 6))
    assert loader_local_rows(None, B) is None
    sharded_ld = StreamingLoader(cfg, cfg.train_file, batch_size=B,
                                 local_rows=(lo, hi))
    eager_full = QGDataset(cfg, cfg.train_file)  # ground truth: all media
    part = batch_arrays(next(sharded_ld.batches()))
    want = batch_arrays(next(eager_full.batches(B)))
    # this process really skipped the foreign block's media
    flo, fhi = (4, 8) if pid == 0 else (0, 4)
    assert not part["frames"][flo:fhi].any()
    assert not part["audio_pcm"][flo:fhi].any()
    gbatch = pad_and_shard_batch(part, mesh)
    np.testing.assert_array_equal(to_host(gbatch["frames"]), want["frames"])
    np.testing.assert_array_equal(to_host(gbatch["frames_len"]),
                                  want["frames_len"])
    np.testing.assert_array_equal(to_host(gbatch["audio_len"]),
                                  want["audio_len"])
    np.testing.assert_allclose(to_host(gbatch["audio_pcm"]),
                               want["audio_pcm"], atol=1)

    # host-side compile decisions reduce through global_max_int so bucket
    # caps cannot diverge between processes that see different rows
    assert global_max_int(3 if pid == 0 else 7) == 7

    # --- ZeRO-1 across processes: the moments shard over the CROSS-HOST
    # data axis (place_global's make_array_from_callback path), the step
    # reduce-scatters the gradient into the update, and gathering the
    # sharded moments back (the checkpoint path, Trainer.save) reproduces
    # the replicated step's moments.
    from mmqg_tpu.parallel.mesh import param_shardings, zero1_shardings
    from mmqg_tpu.parallel.multihost import place_global

    shardings_z = {"params": param_shardings(ts_host["params"], mesh),
                   "opt_state": zero1_shardings(ts_host["opt_state"], mesh)}
    opt_z = place_global(ts_host["opt_state"], shardings_z["opt_state"])
    assert any(hasattr(x, "is_fully_addressable")
               and not x.is_fully_addressable
               for x in jax.tree.leaves(opt_z)), "no cross-process shards"
    ts_z = {
        "params": shard_params_global(ts_host["params"], mesh),
        "model_state": replicate_global(ts_host["model_state"], mesh),
        "opt_state": opt_z,
        "step": replicate_global(ts_host["step"], mesh),
    }
    step_z = make_train_step(mc, optimizer, state_shardings=shardings_z)
    new_z, metrics_z = step_z(ts_z, sbatch, jax.random.PRNGKey(1))
    loss_z = float(metrics_z["loss"])
    assert abs(loss_z - step_loss) <= 1e-4 * abs(step_loss), (
        loss_z, step_loss)
    mu_r = [x for x in jax.tree.leaves(new_ts["opt_state"])
            if hasattr(x, "ndim") and x.ndim >= 2]
    mu_z = [x for x in jax.tree.leaves(new_z["opt_state"])
            if hasattr(x, "ndim") and x.ndim >= 2]
    assert len(mu_r) == len(mu_z) and mu_r
    for a, b in zip(mu_r, mu_z):
        np.testing.assert_allclose(to_host(b), to_host(a),
                                   rtol=1e-4, atol=1e-7)

    # --- FSDP across processes: the PARAMETERS shard over the cross-host
    # data axis too; the step's updated params keep their shards and
    # gathering them back (the checkpoint path) reproduces the replicated
    # step's params.
    from mmqg_tpu.parallel.mesh import fsdp_shardings

    shardings_f = {"params": fsdp_shardings(ts_host["params"], mesh),
                   "opt_state": shardings_z["opt_state"]}
    params_f = place_global(ts_host["params"], shardings_f["params"])
    assert any(hasattr(x, "is_fully_addressable")
               and not x.is_fully_addressable
               for x in jax.tree.leaves(params_f)), "no cross-process shards"
    ts_f = {
        "params": params_f,
        "model_state": replicate_global(ts_host["model_state"], mesh),
        "opt_state": place_global(ts_host["opt_state"],
                                  shardings_f["opt_state"]),
        "step": replicate_global(ts_host["step"], mesh),
    }
    step_f = make_train_step(mc, optimizer, state_shardings=shardings_f)
    new_f, metrics_f = step_f(ts_f, sbatch, jax.random.PRNGKey(1))
    loss_f = float(metrics_f["loss"])
    assert abs(loss_f - step_loss) <= 1e-4 * abs(step_loss), (
        loss_f, step_loss)
    p_r = [x for x in jax.tree.leaves(new_ts["params"])
           if hasattr(x, "ndim") and x.ndim >= 2]
    p_f = [x for x in jax.tree.leaves(new_f["params"])
           if hasattr(x, "ndim") and x.ndim >= 2]
    assert len(p_r) == len(p_f) and p_r
    for a, b in zip(p_r, p_f):
        np.testing.assert_allclose(to_host(b), to_host(a),
                                   rtol=1e-4, atol=1e-7)

    print(f"MULTIHOST_OK pid={pid} primary={is_primary()} "
          f"rel_loss={rel_loss:.2e} rel_gnorm={rel_gnorm:.2e} "
          f"step_loss={step_loss:.4f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
