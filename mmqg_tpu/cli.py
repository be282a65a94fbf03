"""Command-line drivers.

``mmqg-train``   — the reference's ``python train.py`` driver (train.py:220-297)
                   plus flags the reference lacked (mode, epochs, resume).
``mmqg-prepare`` — the reference's whole offline prep chain in one command:
                   assign ids -> salient frames/audio/text (dataset/*.py) ->
                   GloVe ingest (get_glove_matrix.py) -> text normalisation
                   (preprocess_text.py) -> vocab/splits/weights
                   (prepare_data.py). Stages are selectable; each writes the
                   reference's artifact layout so partial interop works.
"""

from __future__ import annotations

import argparse
import json
from typing import List, Optional

import numpy as np

from mmqg_tpu.config import Config


def train_main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser(description="Train the QG model")
    parser.add_argument("-c", "--config_path", type=str, default=None)
    parser.add_argument("--mode", type=str, default="trimodal",
                        choices=["text", "text_video", "trimodal"])
    parser.add_argument("--decoder", type=str, default="attn",
                        choices=["attn", "non_attn"])
    parser.add_argument("--video-encoder", type=str, default=None,
                        choices=["conv_lstm", "resnet"],
                        help="video backbone: conv_lstm (reference main "
                             "path) or resnet (R(2+1)D-18 alternative, "
                             "reference model/encoder.py:21-29); overrides "
                             "config video_encoder and is recorded in the "
                             "saved config snapshot")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--resume", action="store_true",
                        help="resume from the last checkpoint")
    parser.add_argument("--resume-alias", default="last",
                        help="checkpoint alias --resume starts from "
                             "(default: last; e.g. 'pretrained' from "
                             "scripts/convert_released_weights.py)")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard training over all devices "
                             "(data axis of a (data, model) mesh); "
                             "gradients all-reduce over ICI")
    parser.add_argument("--zero1", action="store_true",
                        help="ZeRO-1: shard optimizer state 1/dp over the "
                             "data axis (needs --data-parallel); ~dp x less "
                             "optimizer memory, same collective volume; "
                             "sets config zero1")
    parser.add_argument("--fsdp", action="store_true",
                        help="FSDP/ZeRO-3: shard the parameters themselves "
                             "1/dp over the data axis too (implies --zero1; "
                             "needs --data-parallel); GSPMD all-gathers "
                             "each weight at its use site — ~dp x less "
                             "param+optimizer memory; sets config fsdp")
    parser.add_argument("--sequence-parallel", action="store_true",
                        help="training-side SP: shard the context axis of "
                             "the text attention memory over the mesh's "
                             "model axis (needs --data-parallel and "
                             "mesh_shape with model axis > 1); sets "
                             "config sequence_parallel_train")
    parser.add_argument("--sp-gather-free", action="store_true",
                        help="with --sequence-parallel: run the decoder's "
                             "text attention as the explicit gather-free "
                             "distributed softmax (O(B*H) per-step "
                             "communication independent of context length, "
                             "ops/attention_sp.py) instead of letting GSPMD "
                             "place the gather; sets config sp_gather_free")
    parser.add_argument("--streaming", action="store_true",
                        help="stream batches from disk (double-buffered "
                             "C++ pack pool) instead of materialising the "
                             "corpus in host RAM — for corpora larger than "
                             "memory")
    parser.add_argument("--grad-accum", type=int, default=None,
                        help="gradient-accumulation microbatches per "
                             "optimizer update (overrides config "
                             "grad_accum_steps); lets batch_size exceed "
                             "the single-step HBM ceiling")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="capture a perfetto/tensorboard trace of one "
                             "warm train step into this directory")
    parser.add_argument("--nan-debug", action="store_true",
                        help="sanitizer: re-run any jit producing NaNs "
                             "op-by-op and raise at the offending primitive")
    parser.add_argument("--compile-cache", type=str, default=None,
                        help="persistent XLA compilation-cache directory "
                             "(also config compilation_cache_dir or "
                             "MMQG_COMPILE_CACHE); compiles each train-step "
                             "bucket variant once per machine, not per run")
    parser.add_argument("--multihost", action="store_true",
                        help="join a multi-process runtime "
                             "(jax.distributed): run one process per host, "
                             "combine with --data-parallel for DP over DCN; "
                             "process 0 owns checkpoints/stats")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator host:port for --multihost (omit "
                             "on TPU pods: auto-detected)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args(argv)

    if args.multihost:
        from mmqg_tpu.parallel.multihost import initialize_multihost
        initialize_multihost(args.coordinator, args.num_processes,
                             args.process_id)
        if not args.data_parallel:
            # without a mesh each process would train an identical full
            # copy and all but process 0's would be thrown away
            print("warning: --multihost without --data-parallel runs N "
                  "identical copies of the job (no mesh spans the "
                  "processes); add --data-parallel to shard the batch "
                  "across hosts")

    from mmqg_tpu.data.dataset import QGDataset
    from mmqg_tpu.models import qg_model
    from mmqg_tpu.train import Trainer
    from mmqg_tpu.utils.compilation_cache import maybe_enable_from

    config = (Config.load(args.config_path) if args.config_path else Config())
    maybe_enable_from(args.compile_cache, config)
    if args.grad_accum:
        config = config.replace(grad_accum_steps=args.grad_accum)
    if args.video_encoder:
        config = config.replace(video_encoder=args.video_encoder)
    if args.sequence_parallel:
        config = config.replace(sequence_parallel_train=True)
    if args.sp_gather_free:
        if not (args.sequence_parallel or config.sequence_parallel_train):
            raise SystemExit("--sp-gather-free requires --sequence-parallel "
                             "(it selects HOW the SP attention communicates)")
        config = config.replace(sp_gather_free=True)
    if args.zero1:
        config = config.replace(zero1=True)
    if args.fsdp:
        config = config.replace(fsdp=True)
    config.ensure_dirs()
    load_media = args.mode != "text"
    mesh = None
    import jax
    if args.data_parallel:
        if len(jax.devices()) > 1:
            from mmqg_tpu.parallel import make_mesh
            # config.mesh_shape=(1,1) means "auto": all devices on the data
            # axis; anything else is an explicit (data, model) layout
            if tuple(config.mesh_axis_names) != ("data", "model"):
                raise SystemExit(
                    "mesh_axis_names must stay ('data', 'model'): the "
                    "sharding rules (parallel/mesh.py) name those axes")
            shape = tuple(config.mesh_shape)
            mesh = make_mesh(None if shape == (1, 1) else shape)
            print(f"data-parallel over {len(jax.devices())} devices "
                  f"(mesh {dict(zip(mesh.axis_names, mesh.devices.shape))})")
        else:
            print("warning: --data-parallel requested but only one device "
                  "is visible; training single-device")
    if args.streaming:
        from mmqg_tpu.data.streaming import StreamingLoader
        # multi-process + mesh: each process packs media only for the row
        # block it contributes (sharded loading — per-host IO scales 1/P)
        from mmqg_tpu.parallel.multihost import loader_local_rows
        train_ds = StreamingLoader(config, config.train_file,
                                   batch_size=config.batch_size,
                                   load_media=load_media,
                                   local_rows=loader_local_rows(
                                       mesh, config.batch_size))
        val_ds = StreamingLoader(config, config.val_file,
                                 batch_size=config.eval_batch_size,
                                 load_media=load_media,
                                 local_rows=loader_local_rows(
                                     mesh, config.eval_batch_size))
    else:
        train_ds = QGDataset(config, config.train_file, load_media=load_media)
        val_ds = QGDataset(config, config.val_file, load_media=load_media)
    emb = np.load(config.weights_matrix_file).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(config, n_vocab=len(train_ds.vocab),
                                          mode=args.mode, dec=args.decoder)
    trainer = Trainer(config, mc, emb, train_ds, val_ds, mesh=mesh,
                      profile_dir=args.profile_dir)
    if args.resume and trainer.resume(args.resume_alias):
        print(f"resumed at epoch {trainer.start_epoch} "
              f"(alias {args.resume_alias!r})")
    if args.nan_debug:
        from mmqg_tpu.utils import profiling
        with profiling.nan_debugging():
            stats, best_epoch = trainer.fit(args.epochs)
    else:
        stats, best_epoch = trainer.fit(args.epochs)
    print(f"Best epoch - {best_epoch} !")
    print("Done !")


def prepare_main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser(description="Offline data preparation")
    parser.add_argument("-c", "--config_path", type=str, default=None)
    parser.add_argument("--stages", type=str, default="saliency,glove,text,data",
                        help="comma list of: saliency, glove, text, data")
    parser.add_argument("--workers", type=int, default=None,
                        help="video-decode thread pool size for the "
                             "saliency stage (default: host cores; decode "
                             "is per-video independent and releases the "
                             "GIL)")
    args = parser.parse_args(argv)

    config = (Config.load(args.config_path) if args.config_path else Config())
    config.ensure_dirs()
    stages = set(args.stages.split(","))
    known = {"saliency", "glove", "text", "data"}
    unknown = stages - known
    if unknown:
        raise SystemExit(
            f"error: unknown stage(s) {sorted(unknown)}; "
            f"valid: {sorted(known)}")

    if "saliency" in stages:
        from mmqg_tpu.data.saliency import run_prep_pipeline
        stats = run_prep_pipeline(config, workers=args.workers)
        print(f"saliency: {stats}")

    if "glove" in stages:
        from mmqg_tpu.data.glove import ingest_glove
        matrix = ingest_glove(config)
        print(f"glove: {matrix.shape[0]} words")

    if "text" in stages:
        from mmqg_tpu.data.text_prep import preprocess_corpus
        with open(config.salient_text_file, encoding="utf8") as f:
            corpus = json.load(f)
        failed_id, processed = preprocess_corpus(corpus)
        if processed is None:
            raise SystemExit(f"Error: preprocessing {failed_id} returned None.")
        with open(config.preprocessed_text_file, "w") as f:
            json.dump(processed, f)
        print(f"text: {len(processed)} records")

    if "data" in stages:
        from mmqg_tpu.data.vocab import prepare_data
        with open(config.preprocessed_text_file) as f:
            processed = json.load(f)
        info = prepare_data(config, processed)
        print(f"data: vocab={len(info['vocab'])} splits={info['splits']}")

    print("Done !")


if __name__ == "__main__":
    train_main()
