"""Batched, fixed-shape dataset for the QG pipeline.

The reference fed one variable-length sample at a time through a
``DataLoader(batch_size=1)`` (reference train.py:233-234, utils/dataset.py:8-55),
which forces per-sample Python loops. TPU-first inversion: this loader
assembles **padded fixed-shape numpy batches** (static shapes are what XLA
wants; the reference itself already capped every length —
reference config.py:69-71) and ships raw uint8 frames + raw PCM to the device,
where jitted kernels do float conversion / normalisation / log-mel
featurisation (see mmqg_tpu.models.frontends).

Per-example field parity with reference utils/dataset.py:27-55:
  context ids  <- whitespace split + vocab lookup (custom_transforms.py:23-25)
  frames       <- salient_frames/v_{vid}_q_{qid}_.npy  (dataset.py:38)
  audio        <- salient_audio_clip/v_{vid}_q_{qid}_.wav (dataset.py:43)
  target       <- question + ' <end>' tokenised        (dataset.py:50)
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from mmqg_tpu.data.vocab import END, PAD_ID, START_ID, encode_tokens, pad_to
from mmqg_tpu.data import wav as wavio


@dataclass
class Batch:
    """One fixed-shape training/eval batch. ``valid`` masks padding examples
    (last batch of an epoch); all model code weights losses/metrics by it."""
    context_ids: np.ndarray    # (B, Lc) int32
    context_len: np.ndarray    # (B,)  int32
    frames: np.ndarray         # (B, Tav, H, W, 3) uint8
    frames_len: np.ndarray     # (B,)  int32  (n salient frames == n AV steps)
    audio_pcm: np.ndarray      # (B, S) int16 PCM mono 16 kHz (f32 also accepted)
    audio_len: np.ndarray      # (B,)  int32  (samples)
    target_ids: np.ndarray     # (B, Td) int32   question tokens + <end>
    target_len: np.ndarray     # (B,)  int32
    question_id: np.ndarray    # (B,)  int32
    valid: np.ndarray          # (B,)  bool
    questions: List[str]       # host-side ground-truth strings (BLEU)

    @property
    def size(self) -> int:
        return int(self.valid.sum())


def encode_text_fields(config, records: List[Dict], vocab: Dict[str, int],
                       load_media: bool) -> Dict:
    """Eager text-side example encoding shared by ``QGDataset`` and
    ``StreamingLoader`` (one copy of the tokenise/pad/length + media-path
    rules — reference utils/dataset.py:38-55 semantics: target = question
    + <end>, no <start>; media at salient_*/v_{vid}_q_{qid}_ paths)."""
    Lc = config.context_max_length
    Td = config.question_max_length + 1  # room for question tokens + <end>
    n = len(records)
    out = {
        "context_ids": np.zeros((n, Lc), np.int32),
        "context_len": np.zeros((n,), np.int32),
        "target_ids": np.zeros((n, Td), np.int32),
        "target_len": np.zeros((n,), np.int32),
        "question_id": np.zeros((n,), np.int32),
        "questions": [],
        "frame_paths": [],
        "wav_paths": [],
    }
    for i, rec in enumerate(records):
        ctx = encode_tokens(rec["context"], vocab)
        tgt = encode_tokens(f"{rec['question']} {END}", vocab)
        out["context_ids"][i] = pad_to(ctx, Lc)
        out["context_len"][i] = min(len(ctx), Lc)
        out["target_ids"][i] = pad_to(tgt, Td)
        out["target_len"][i] = min(len(tgt), Td)
        out["question_id"][i] = int(rec["question_id"])
        out["questions"].append(rec["question"])
        vid, qid = rec["video_id"], rec["question_id"]
        fpath = Path(config.salient_frames_path) / f"v_{vid}_q_{qid}_.npy"
        apath = Path(config.salient_audio_path) / f"v_{vid}_q_{qid}_.wav"
        out["frame_paths"].append(
            str(fpath) if load_media and os.path.exists(fpath) else None)
        out["wav_paths"].append(
            str(apath) if load_media and os.path.exists(apath) else None)
    return out


class QGDataset:
    """Eagerly materialised split (the corpus is small: 250 questions over 197
    videos — reference dataset/labelled_questions.json); exposes shuffled
    fixed-shape batches.

    ``load_media=False`` runs text-only (frames/audio zeroed) — the
    non_attn/text configuration (reference non_attn_train.py)."""

    def __init__(
        self,
        config,
        questions_file: Path,
        vocab: Optional[Dict[str, int]] = None,
        index_to_word: Optional[Dict[str, str]] = None,
        load_media: bool = True,
        max_audio_seconds: Optional[int] = None,
    ):
        self.config = config
        with open(questions_file) as f:
            self.records: List[Dict] = json.load(f)
        if vocab is None:
            with open(config.vocab_file) as f:
                vocab = json.load(f)
        if index_to_word is None:
            with open(config.index_to_word_file) as f:
                index_to_word = json.load(f)
        self.vocab = vocab
        self.index_to_word = index_to_word
        self.load_media = load_media

        Tav = config.av_max_length
        H = W = config.frame_size
        S = (max_audio_seconds or config.av_max_length) * config.audio_sample_rate
        n = len(self.records)

        text = encode_text_fields(config, self.records, vocab, load_media)
        self.context_ids = text["context_ids"]
        self.context_len = text["context_len"]
        self.target_ids = text["target_ids"]
        self.target_len = text["target_len"]
        self.question_id = text["question_id"]
        self.questions = text["questions"]

        self.frames = np.zeros((n, Tav, H, W, 3), np.uint8)
        self.frames_len = np.zeros((n,), np.int32)
        # PCM16 on the wire: half the H2D bytes of f32; device converts
        self.audio_pcm = np.zeros((n, S), np.int16)
        self.audio_len = np.zeros((n,), np.int32)

        if load_media:
            self._load_media(text["frame_paths"], text["wav_paths"])
        # When media is absent we still expose >=1 AV step so attention over
        # the AV axes stays well-defined (all-masked softmax is NaN).
        np.maximum(self.frames_len, 1, out=self.frames_len)

    def _load_media(self, frame_paths, wav_paths) -> None:
        """Fill frame/audio buffers — threaded C++ packer when available
        (native/mmqg_host.cpp), Python fallback otherwise."""
        from mmqg_tpu.data import native

        handle = native.pack_batch_async(
            frame_paths, wav_paths, self.frames, self.audio_pcm,
            self.frames_len, self.audio_len,
            target_rate=self.config.audio_sample_rate,
            n_threads=max(2, (os.cpu_count() or 1)))
        if handle is not None:
            handle.wait()  # item failures leave zero lengths (masked out)
            return
        S = self.audio_pcm.shape[1]
        Tav = self.frames.shape[1]
        for i, (fp, ap) in enumerate(zip(frame_paths, wav_paths)):
            if fp is not None:
                fr = np.load(fp)
                t = min(fr.shape[0], Tav)
                if t > 0:
                    self.frames[i, :t] = fr[:t]
                self.frames_len[i] = t
            if ap is not None:
                pcm = wavio.load_mono_16k(ap, self.config.audio_sample_rate)
                s = min(len(pcm), S)
                self.audio_pcm[i, :s] = np.clip(
                    pcm[:s] * 32767.0, -32768, 32767).astype(np.int16)
                self.audio_len[i] = s

    def __len__(self) -> int:
        return len(self.records)

    def batches(
        self,
        batch_size: int,
        shuffle: bool = False,
        rng: Optional[np.random.Generator] = None,
        drop_last: bool = False,
    ) -> Iterator[Batch]:
        """Yield fixed-shape batches; the tail batch is padded with repeated
        examples and masked via ``valid`` so every jit call sees one shape."""
        idx = np.arange(len(self.records))
        if shuffle:
            (rng or np.random.default_rng(self.config.seed)).shuffle(idx)
        for s in range(0, len(idx), batch_size):
            chunk = idx[s:s + batch_size]
            if len(chunk) < batch_size:
                if drop_last:
                    return
                pad = np.full(batch_size - len(chunk), chunk[-1] if len(chunk) else 0)
                valid = np.concatenate([np.ones(len(chunk), bool), np.zeros(len(pad), bool)])
                chunk = np.concatenate([chunk, pad])
            else:
                valid = np.ones(batch_size, bool)
            yield Batch(
                context_ids=self.context_ids[chunk],
                context_len=self.context_len[chunk],
                frames=self.frames[chunk],
                frames_len=self.frames_len[chunk],
                audio_pcm=self.audio_pcm[chunk],
                audio_len=self.audio_len[chunk],
                target_ids=self.target_ids[chunk],
                target_len=self.target_len[chunk],
                question_id=self.question_id[chunk],
                valid=valid,
                questions=[self.questions[j] for j in chunk],
            )

    def num_batches(self, batch_size: int, drop_last: bool = False) -> int:
        n = len(self.records)
        return n // batch_size if drop_last else -(-n // batch_size)
