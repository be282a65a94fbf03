"""GloVe ingestion: glove.6B.<dim>d.txt -> matrix + word<->idx artifacts.

Parity with reference get_glove_matrix.py:5-24, minus its fixed 400000-row
preallocation (we size from the file) and its deprecated ``np.float`` usage.
Artifacts keep the reference's filenames so downstream stages interoperate
(reference config.py:56-59).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np


def parse_glove_file(path: Path, emb_dim: int) -> Tuple[List[str], Dict[str, int], np.ndarray]:
    words: List[str] = []
    word2idx: Dict[str, int] = {}
    vecs: List[np.ndarray] = []
    with open(path, "rb") as f:
        for line in f:
            parts = line.decode("utf-8").rstrip("\n").split(" ")
            word = parts[0]
            vec = np.asarray(parts[1:1 + emb_dim], dtype=np.float32)
            word2idx[word] = len(words)
            words.append(word)
            vecs.append(vec)
    matrix = np.stack(vecs) if vecs else np.zeros((0, emb_dim), np.float32)
    return words, word2idx, matrix


def ingest_glove(config) -> np.ndarray:
    """Run the full stage and write the reference-format artifacts
    (reference get_glove_matrix.py:22-24)."""
    words, word2idx, matrix = parse_glove_file(config.glove_file, config.glove_emb_dim)
    Path(config.glove_words_file).parent.mkdir(parents=True, exist_ok=True)
    with open(config.glove_words_file, "wb") as f:
        pickle.dump(words, f)
    with open(config.glove_idx_file, "wb") as f:
        pickle.dump(word2idx, f)
    np.save(config.glove_matrix_file, matrix)
    return matrix
