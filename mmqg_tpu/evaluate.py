"""Evaluation / inference driver (reference evaluate.py:34-229 rebuilt).

CLI contract parity: ``--best/--last``, ``--config_path``, ``--strategy``
(greedy | sampling | topk | topp | beam — topp and beam are new),
predictions dumped to
``{best|last}_predictions_<strategy>.json`` with the reference's record schema
{question_id, gt_question, pred_question} (reference evaluate.py:114-118,
220-227), plus the BLEU suite printed and returned.

Note the reference's evaluate.py crashed as written (wrong ctor kwargs /
return-arity — SURVEY.md §3.3); this implements its evident intent.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from mmqg_tpu import checkpoint as ckpt
from mmqg_tpu import decode as DEC
from mmqg_tpu import metrics as M
from mmqg_tpu.config import Config
from mmqg_tpu.data.dataset import QGDataset

from mmqg_tpu.models import qg_model
from mmqg_tpu.train import batch_arrays, init_train_state, make_optimizer


def evaluate(
    params: Dict,
    model_state: Dict,
    mc: qg_model.ModelConfig,
    dataset: QGDataset,
    *,
    strategy: str = "greedy",
    batch_size: int = 32,
    pred_max_len: int = 21,
    beam_size: int = 4,
    topk: int = 1,
    topp: float = 0.9,
    seed: int = 0,
    use_pallas: bool = True,
    compat_bleu: bool = False,
    mesh=None,
) -> Tuple[List[Dict], Dict[str, float]]:
    """Decode the whole dataset; returns (predictions, bleu suite averages).

    ``mesh``: a ``jax.sharding.Mesh`` for multi-chip evaluation — params must
    already be placed (parallel.shard_params); each batch is padded to the
    data axis and sharded batch-over-data (padded rows produce extra token
    rows that the zip below never reads)."""
    from mmqg_tpu.utils.pipelining import pipelined

    rng = jax.random.PRNGKey(seed)
    predictions: List[Dict] = []
    sums = {k: 0.0 for k in M.BLEU_WEIGHTS}
    n_total = 0

    def dispatch(batch):
        nonlocal rng
        arrays = batch_arrays(batch)
        has_av = mc.mode in ("text_video", "trimodal")
        cap = (DEC.audio_bucket(mc, arrays["audio_len"])
               if mc.mode == "trimodal" else None)
        fcap = DEC.frames_bucket(mc, arrays["frames_len"]) if has_av else None
        if mesh is not None:
            from mmqg_tpu.parallel import pad_and_shard_batch
            arrays = pad_and_shard_batch(arrays, mesh)
        if strategy == "beam":
            return DEC.beam_decode_batch(
                params, model_state, mc, arrays, max_len=pred_max_len,
                beam_size=beam_size, use_pallas=use_pallas,
                audio_cap=cap, frames_cap=fcap)
        rng, k = jax.random.split(rng)
        return DEC.decode_batch(
            params, model_state, mc, arrays, k, strategy=strategy,
            max_len=pred_max_len, k=topk, p=topp,
            use_pallas=use_pallas, audio_cap=cap, frames_cap=fcap)

    def finalize(toks, batch):
        nonlocal n_total
        word_rows = DEC.tokens_to_words(np.asarray(toks),
                                        dataset.index_to_word)
        for words, q, qid, ok in zip(word_rows, batch.questions,
                                     batch.question_id, batch.valid):
            if not ok:
                continue
            suite = M.bleu_suite(q, words, compat=compat_bleu)
            for key, v in suite.items():
                sums[key] += v
            predictions.append({
                "question_id": int(qid),
                "gt_question": q,
                "pred_question": " ".join(words),
            })
            n_total += 1

    # deferred device->host reads (utils/pipelining.py): the host scores
    # batch i's BLEU while the device decodes i+1/i+2 — the serial-synced
    # vs queued gap is ~24 ms/batch on this backend (bench.py)
    for _ in pipelined(dataset.batches(batch_size), dispatch, finalize):
        pass
    avgs = {k: v / max(n_total, 1) for k, v in sums.items()}
    return predictions, avgs


def main(argv: Optional[List[str]] = None) -> Dict[str, float]:
    parser = argparse.ArgumentParser(description="Evaluate model")
    parser.add_argument("-b", "--best", action="store_true",
                        help="get best epoch results")
    parser.add_argument("-l", "--last", action="store_true",
                        help="get last epoch results")
    parser.add_argument("-c", "--config_path", type=str, required=True)
    parser.add_argument("-s", "--strategy", type=str, required=True,
                        choices=["greedy", "sampling", "topk", "topp",
                                 "beam"])
    parser.add_argument("--mode", type=str, default="trimodal",
                        choices=list(qg_model.MODES))
    parser.add_argument("--decoder", type=str, default="attn",
                        choices=["attn", "non_attn"])
    parser.add_argument("--compat-bleu", action="store_true",
                        help="score with the reference's (non-standard) BLEU call")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard evaluation batches over all devices "
                             "(a data-axis Mesh; params replicate)")
    parser.add_argument("--top-k", type=int, default=1,
                        help="k for -s topk (reference used 1)")
    parser.add_argument("--top-p", type=float, default=0.9,
                        help="nucleus mass for -s topp")
    parser.add_argument("--streaming", action="store_true",
                        help="stream test batches from disk (double-buffered "
                             "pack pool) instead of materialising the split "
                             "in host RAM")
    parser.add_argument("--compile-cache", type=str, default=None,
                        help="persistent XLA compilation-cache directory "
                             "(also config compilation_cache_dir or "
                             "MMQG_COMPILE_CACHE)")
    args = parser.parse_args(argv)

    config = Config.load(args.config_path)
    from mmqg_tpu.utils.compilation_cache import maybe_enable_from
    maybe_enable_from(args.compile_cache, config)
    alias = "last" if args.last else "best"

    if args.streaming:
        from mmqg_tpu.data.streaming import StreamingLoader
        dataset = StreamingLoader(config, config.test_file,
                                  batch_size=config.eval_batch_size,
                                  load_media=(args.mode != "text"))
    else:
        dataset = QGDataset(config, config.test_file,
                            load_media=(args.mode != "text"))
    mc = qg_model.ModelConfig.from_config(config, n_vocab=len(dataset.vocab),
                                          mode=args.mode, dec=args.decoder)
    if not ckpt.has_checkpoint(config.checkpoint_dir, alias):
        raise SystemExit(
            f"error: no '{alias}' checkpoint in {config.checkpoint_dir} — "
            f"train first (mmqg-train) or pass "
            f"{'--best' if alias == 'last' else '--last'}")
    optimizer = make_optimizer(config)
    emb = np.load(config.weights_matrix_file).astype(np.float32)
    template = init_train_state(jax.random.PRNGKey(0), mc, emb, optimizer)
    train_state, _ = ckpt.load_checkpoint(config.checkpoint_dir, alias, template)

    mesh = None
    params, model_state = train_state["params"], train_state["model_state"]
    if args.data_parallel and len(jax.devices()) > 1:
        from jax.sharding import NamedSharding, PartitionSpec
        from mmqg_tpu.parallel import make_mesh, shard_params
        if tuple(config.mesh_axis_names) != ("data", "model"):
            raise SystemExit(
                "mesh_axis_names must stay ('data', 'model'): the sharding "
                "rules (parallel/mesh.py) name those axes")
        shape = tuple(config.mesh_shape)
        mesh = make_mesh(None if shape == (1, 1) else shape)
        params = shard_params(params, mesh)
        # model_state (BN stats) replicates explicitly, mirroring
        # Trainer._place_on_mesh — without this GSPMD would have to infer
        # placement from single-device inputs (tested: mesh_eval parity in
        # tests/parallel_cases.py)
        model_state = jax.device_put(model_state,
                                     NamedSharding(mesh, PartitionSpec()))

    predictions, bleu = evaluate(
        params, model_state, mc, dataset,
        strategy=args.strategy, batch_size=config.eval_batch_size,
        pred_max_len=config.question_max_length, beam_size=config.beam_size,
        topk=args.top_k, topp=args.top_p,
        use_pallas=config.use_pallas, compat_bleu=args.compat_bleu, mesh=mesh)

    out_path = config.output_path / f"{alias}_predictions_{args.strategy}.json"
    with open(out_path, "w") as f:
        json.dump(predictions, f)
    print(f"Predictions saved to {out_path}")
    print(f"Val_bleu - {round(bleu['bleu'], 3)}, "
          f"Val_bleu_1 - {round(bleu['bleu_1'], 3)}")
    return bleu


if __name__ == "__main__":
    main()
