"""Vocabulary, embedding-matrix, and split construction.

Parity targets (all deterministic, so golden-testable):
* reserved ids ``<pad>=0, <start>=1, <end>=2`` — reference prepare_data.py:59-81
* vocab-aligned GloVe slice, OOV ~ N(0, 0.6^2), ``<pad>`` row zero —
  reference prepare_data.py:26-49
* 80/10/10 train/val/test split with sklearn ``train_test_split`` seed 42 —
  reference prepare_data.py:9-24 (we call sklearn too so the split indices are
  bit-identical to the reference's artifacts)

Deliberate fix vs the reference: the weight matrix is used as **float32**.
The reference cast it to int64 (``.long()`` at train.py:227), truncating every
embedding component toward zero — a documented bug, not a behaviour to keep.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

PAD_ID, START_ID, END_ID = 0, 1, 2
PAD, START, END = "<pad>", "<start>", "<end>"


def build_vocab(corpus: List[Dict]) -> Tuple[Dict[str, int], Dict[int, str]]:
    """First-seen-order vocab over question, context, answer of each record
    (reference prepare_data.py:51-81)."""
    vocab: Dict[str, int] = {PAD: PAD_ID, START: START_ID, END: END_ID}
    index_to_word: Dict[int, str] = {PAD_ID: PAD, START_ID: START, END_ID: END}
    idx = 3
    for entry in corpus:
        for key in ("question", "context", "answer"):
            for tok in entry[key].split():
                if tok not in vocab:
                    vocab[tok] = idx
                    index_to_word[idx] = tok
                    idx += 1
    return vocab, index_to_word


def save_vocab(vocab: Dict, path: Path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(vocab, f)


def load_vocab(path: Path) -> Dict:
    with open(path, "r") as f:
        return json.load(f)


def build_weight_matrix(
    wtoi: Dict[str, int],
    glove_matrix: np.ndarray,
    glove_word2idx: Dict[str, int],
    emb_dim: int,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    """Vocab-aligned embedding table (reference prepare_data.py:26-49):
    GloVe vector when found, N(0, 0.6^2) for OOV, zeros for <pad>."""
    rng = rng or np.random.RandomState(0)
    out = np.zeros((len(wtoi), emb_dim), dtype=np.float32)
    found = 0
    for word, idx in wtoi.items():
        gi = glove_word2idx.get(word)
        if gi is not None:
            out[idx] = glove_matrix[gi]
            found += 1
        elif word != PAD:
            out[idx] = rng.normal(scale=0.6, size=(emb_dim,))
    return out


def save_weight_matrix(config, wtoi: Dict[str, int]) -> np.ndarray:
    glove_matrix = np.load(config.glove_matrix_file)
    with open(config.glove_idx_file, "rb") as f:
        glove_word2idx = pickle.load(f)
    wm = build_weight_matrix(wtoi, glove_matrix, glove_word2idx, config.glove_emb_dim)
    Path(config.weights_matrix_file).parent.mkdir(parents=True, exist_ok=True)
    np.save(config.weights_matrix_file, wm)
    return wm


def split_data(config, corpus: List[Dict]) -> Tuple[List, List, List]:
    """80/10/10 split, sklearn seed 42 — bit-identical to reference
    prepare_data.py:9-24 (same library, same seeds)."""
    from sklearn.model_selection import train_test_split

    train, rem = train_test_split(corpus, test_size=0.2, random_state=42)
    val, test = train_test_split(rem, test_size=0.5, random_state=42)
    for path, part in ((config.train_file, train), (config.val_file, val),
                       (config.test_file, test)):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            json.dump(part, f)
    return train, val, test


def prepare_data(config, preprocessed: List[Dict]) -> Dict:
    """Full L3 stage (reference prepare_data.py:89-107): vocab + inverse +
    weight matrix + splits, written to config.data_path."""
    vocab, index_to_word = build_vocab(preprocessed)
    save_vocab(vocab, config.vocab_file)
    save_vocab({str(k): v for k, v in index_to_word.items()}, config.index_to_word_file)
    wm = save_weight_matrix(config, vocab)
    train, val, test = split_data(config, preprocessed)
    return {
        "vocab": vocab,
        "index_to_word": index_to_word,
        "weight_matrix": wm,
        "splits": (len(train), len(val), len(test)),
    }


def encode_tokens(text: str, vocab: Dict[str, int]) -> np.ndarray:
    """Whitespace-split -> vocab ids (reference utils/custom_transforms.py:23-25)."""
    return np.asarray([vocab[w] for w in text.split()], dtype=np.int32)


def pad_to(ids: np.ndarray, length: int, pad_id: int = PAD_ID) -> np.ndarray:
    out = np.full((length,), pad_id, dtype=np.int32)
    n = min(len(ids), length)
    out[:n] = ids[:n]
    return out
