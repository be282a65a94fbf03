"""Streaming double-buffered batch loader.

``QGDataset`` materialises the whole corpus up front — right for the
reference's 250-question dataset, wrong for corpora larger than host RAM.
``StreamingLoader`` assembles fixed-shape batches on the fly with the C++
pack pool (native/mmqg_host.cpp) filling batch N+1's media buffers **while
the TPU consumes batch N** (SURVEY.md §7: overlapping host ingest with device
compute is where serving throughput is won). Text fields are tokenised
eagerly (tiny); frames/audio stream from disk per batch.

Python fallback (no native lib): same interface, synchronous packing.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import numpy as np

from mmqg_tpu.data import dataset as dataset_mod
from mmqg_tpu.data import native
from mmqg_tpu.data import wav as wavio
from mmqg_tpu.data.dataset import Batch


class StreamingLoader:
    def __init__(self, config, questions_file: Path,
                 vocab: Optional[Dict[str, int]] = None,
                 index_to_word: Optional[Dict[str, str]] = None,
                 *, batch_size: int, load_media: bool = True,
                 max_audio_seconds: Optional[int] = None,
                 pack_threads: int = 2,
                 local_rows: Optional[tuple] = None):
        """``local_rows=(start, stop)``: per-process sharded loading for
        multi-host runs — pack media only for batch rows in [start, stop),
        the block this process contributes to the global batch
        (parallel.multihost.local_row_range). Other rows' media buffers stay
        zero and never reach a device (assemble_global_batch takes each row
        from its owning process), so per-host disk/decode cost scales 1/P
        with the process count instead of every host reading the full
        global batch. Text fields stay full (tiny, and the host-side BLEU /
        bucket logic wants them). None = load every row (single-process)."""
        self.config = config
        self.batch_size = batch_size
        self.load_media = load_media
        if local_rows is not None:
            lo, hi = int(local_rows[0]), int(local_rows[1])
            if not (0 <= lo <= hi <= batch_size):
                raise ValueError(
                    f"local_rows {local_rows} out of range for batch_size "
                    f"{batch_size}")
            local_rows = (lo, hi)
        self.local_rows = local_rows
        self.pack_threads = pack_threads
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

        text = dataset_mod.encode_text_fields(config, self.records, vocab,
                                              load_media)
        self.context_ids = text["context_ids"]
        self.context_len = text["context_len"]
        self.target_ids = text["target_ids"]
        self.target_len = text["target_len"]
        self.question_id = text["question_id"]
        self.questions: List[str] = text["questions"]
        self.frame_paths: List[Optional[str]] = text["frame_paths"]
        self.wav_paths: List[Optional[str]] = text["wav_paths"]

        self._Tav = config.av_max_length
        self._H = self._W = config.frame_size
        self._S = (max_audio_seconds or config.av_max_length) * config.audio_sample_rate
        # THREE rotating media buffers: while batch N is being consumed,
        # N+1 is being packed and the consumer may still hold N-1 (the
        # standard prefetch pattern keeps two batches live) — with only two
        # buffers the pack of N+1 would overwrite N-1 underneath the caller
        self._bufs = [self._alloc(), self._alloc(), self._alloc()]

    def _alloc(self):
        B = self.batch_size
        return {
            "frames": np.zeros((B, self._Tav, self._H, self._W, 3), np.uint8),
            "audio_pcm": np.zeros((B, self._S), np.int16),
            "frames_len": np.zeros((B,), np.int32),
            "audio_len": np.zeros((B,), np.int32),
        }

    # ------------------------------------------------------------- packing
    def _start_pack(self, chunk: np.ndarray, buf: Dict):
        """Begin filling ``buf`` for ``chunk``; returns a wait()-able or None
        (already filled synchronously via the Python fallback)."""
        for k in ("frames", "audio_pcm", "frames_len", "audio_len"):
            buf[k].fill(0)
        if not self.load_media:
            return None
        fps = [self.frame_paths[j] for j in chunk]
        wps = [self.wav_paths[j] for j in chunk]
        if self.local_rows is not None:  # pack only this process's rows
            lo, hi = self.local_rows
            fps = [p if lo <= bi < hi else None for bi, p in enumerate(fps)]
            wps = [p if lo <= bi < hi else None for bi, p in enumerate(wps)]
        handle = native.pack_batch_async(
            fps, wps, buf["frames"], buf["audio_pcm"],
            buf["frames_len"], buf["audio_len"],
            target_rate=self.config.audio_sample_rate,
            n_threads=self.pack_threads)
        if handle is not None:
            return handle
        # Python fallback
        for bi, j in enumerate(chunk):
            if fps[bi] is not None:
                fr = np.load(fps[bi])
                t = min(fr.shape[0], self._Tav)
                buf["frames"][bi, :t] = fr[:t]
                buf["frames_len"][bi] = t
            if wps[bi] is not None:
                pcm = wavio.load_mono_16k(wps[bi], self.config.audio_sample_rate)
                s = min(len(pcm), self._S)
                buf["audio_pcm"][bi, :s] = np.clip(
                    pcm[:s] * 32767.0, -32768, 32767).astype(np.int16)
                buf["audio_len"][bi] = s
        return None

    def _emit(self, chunk: np.ndarray, valid: np.ndarray, buf: Dict) -> Batch:
        np.maximum(buf["frames_len"], 1, out=buf["frames_len"])
        return Batch(
            context_ids=self.context_ids[chunk],
            context_len=self.context_len[chunk],
            frames=buf["frames"], frames_len=buf["frames_len"],
            audio_pcm=buf["audio_pcm"], audio_len=buf["audio_len"],
            target_ids=self.target_ids[chunk],
            target_len=self.target_len[chunk],
            question_id=self.question_id[chunk],
            valid=valid,
            questions=[self.questions[j] for j in chunk],
        )

    def __len__(self) -> int:
        return len(self.records)

    def batches(self, batch_size: Optional[int] = None,
                shuffle: bool = False,
                rng: Optional[np.random.Generator] = None,
                drop_last: bool = False) -> Iterator[Batch]:
        """Yield fixed-shape batches with pack(N+1) overlapping consume(N).

        Signature-compatible with ``QGDataset.batches`` so a
        ``StreamingLoader`` drops into the ``Trainer`` for corpora larger
        than host RAM; ``batch_size`` (if given) must match the loader's.

        LIFETIME: the media arrays of a yielded Batch alias one of three
        rotating buffers; a batch stays valid while the NEXT one is held
        and packed (the standard prefetch pattern), and is overwritten two
        advances later — don't collect batches into a list."""
        if batch_size is not None and batch_size != self.batch_size:
            raise ValueError(
                f"batch_size {batch_size} != loader batch_size "
                f"{self.batch_size} (fixed at construction: the rotating "
                f"pack buffers are pre-allocated)")
        if drop_last:
            raise NotImplementedError("StreamingLoader always pads the tail")
        idx = np.arange(len(self.records))
        if shuffle:
            (rng or np.random.default_rng(self.config.seed)).shuffle(idx)
        B = self.batch_size
        chunks = []
        for s in range(0, len(idx), B):
            chunk = idx[s:s + B]
            if len(chunk) < B:
                pad = np.full(B - len(chunk), chunk[-1])
                valid = np.concatenate([np.ones(len(chunk), bool),
                                        np.zeros(len(pad), bool)])
                chunk = np.concatenate([chunk, pad])
            else:
                valid = np.ones(B, bool)
            chunks.append((chunk, valid))
        if not chunks:
            return
        pending = self._start_pack(chunks[0][0], self._bufs[0])
        try:
            for i, (chunk, valid) in enumerate(chunks):
                if pending is not None:
                    pending.wait()
                nxt = i + 1
                if nxt < len(chunks):  # overlap: pack next while caller consumes
                    pending = self._start_pack(chunks[nxt][0],
                                               self._bufs[nxt % 3])
                else:
                    pending = None
                yield self._emit(chunk, valid, self._bufs[i % 3])
        finally:
            # abandoned generator: join any in-flight pack threads before the
            # buffers can be reclaimed
            if pending is not None:
                pending.wait()
