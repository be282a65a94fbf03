"""Synthetic-corpus builder for tests (the real corpus needs videos we don't
ship). Produces every artifact of the reference's prep pipeline in its exact
on-disk layout: preprocessed text json, vocab/index_to_word, GloVe-style
matrix, weight_matrix.npy, train/val/test splits, salient frames .npy, and
salient audio .wav (reference config.py:27-50 layout)."""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Dict, List

import numpy as np

from mmqg_tpu.data import wav as wavio
from mmqg_tpu.data.vocab import prepare_data

_WORDS = ("what how why when where is the of a in process system model data "
          "value function result method state time change level part").split()


def _sentence(rng: np.random.Generator, lo: int, hi: int) -> str:
    n = int(rng.integers(lo, hi + 1))
    return " ".join(rng.choice(_WORDS, size=n))


def build_tiny_corpus(config, n_questions: int = 12, seed: int = 0) -> Dict:
    rng = np.random.default_rng(seed)
    config.ensure_dirs()
    Path(config.salient_frames_path).mkdir(parents=True, exist_ok=True)
    Path(config.salient_audio_path).mkdir(parents=True, exist_ok=True)
    Path(config.glove_path).mkdir(parents=True, exist_ok=True)

    corpus: List[Dict] = []
    for qid in range(n_questions):
        vid = f"vid{qid % 4}"
        question = "what is the " + _sentence(rng, 1, config.question_max_length - 4)
        context = _sentence(rng, 4, config.context_max_length - 1)
        answer = _sentence(rng, 1, 3)
        corpus.append({
            "question_id": qid, "video_id": vid,
            "question": question, "context": context, "answer": answer,
        })
        # frames artifact: (T, H, W, 3) uint8, T in [1, av_max]
        t = int(rng.integers(1, config.av_max_length + 1))
        frames = rng.integers(0, 256, size=(t, config.frame_size,
                                            config.frame_size, 3), dtype=np.uint8)
        np.save(Path(config.salient_frames_path) / f"v_{vid}_q_{qid}_.npy", frames)
        # audio artifact: ~t seconds at a tiny rate
        n_samples = t * config.audio_sample_rate
        pcm = (0.2 * np.sin(np.linspace(0, 40 * np.pi, n_samples))
               ).astype(np.float32)
        wavio.write_wav(Path(config.salient_audio_path) / f"v_{vid}_q_{qid}_.wav",
                        pcm, config.audio_sample_rate)

    with open(config.preprocessed_text_file, "w") as f:
        json.dump(corpus, f)

    # GloVe-style artifacts covering a subset of words
    glove_words = list(_WORDS[:16])
    glove_matrix = rng.normal(size=(len(glove_words), config.glove_emb_dim)
                              ).astype(np.float32)
    word2idx = {w: i for i, w in enumerate(glove_words)}
    np.save(config.glove_matrix_file, glove_matrix)
    with open(config.glove_idx_file, "wb") as f:
        pickle.dump(word2idx, f)
    with open(config.glove_words_file, "wb") as f:
        pickle.dump(glove_words, f)

    info = prepare_data(config, corpus)
    info["corpus"] = corpus
    return info


def single_step_setup(config, *, mode="text", optim=None, dropout=None,
                      batch_size=8):
    """Common harness for single-train-step tests: returns
    ``(mc, optimizer, fresh_ts, batch)`` where ``fresh_ts()`` builds a fresh
    device train state each call (the train step donates its inputs, so a
    state must never be reused). Used by the grad-accumulation tests and
    the mesh suite."""
    import jax
    import jax.numpy as jnp

    from mmqg_tpu.data.dataset import QGDataset
    from mmqg_tpu.models import qg_model
    from mmqg_tpu.train import (batch_arrays, init_train_state,
                                make_optimizer)

    ds = QGDataset(config, config.train_file, load_media=(mode != "text"))
    emb = np.load(config.weights_matrix_file).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(config, n_vocab=len(ds.vocab),
                                          mode=mode)
    if dropout is not None:
        mc = mc._replace(dropout=dropout, text_dropout=dropout)
    if optim is not None:
        config = config.replace(optim=optim)
    optimizer = make_optimizer(config)
    ts0 = init_train_state(jax.random.PRNGKey(0), mc, emb, optimizer)
    ts_host = jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "ndim") else x, ts0)

    def fresh_ts():
        return jax.tree.map(
            lambda x: jnp.asarray(np.array(x)) if hasattr(x, "ndim") else x,
            ts_host)

    batch = batch_arrays(next(ds.batches(batch_size)))
    return mc, optimizer, fresh_ts, batch
