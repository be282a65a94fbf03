"""Subtitle parsing (.srt / .vtt) and salient-text extraction.

The reference leaned on ``pysrt`` and ``webvtt`` (reference
dataset/get_salient_text.py:6-7); neither exists in this environment, and both
formats are simple enough that hermetic parsers are the right call for a
standalone framework.

Semantics parity (and one deliberate fix):
* caption overlap test ``is_important`` — reference get_salient_text.py:9-16;
* caption text cleanup (lowercase, newline->space, strip) —
  reference get_salient_text.py:18-22;
* the reference's VTT branch computed the caption *end* from ``caption.start``
  (copy-paste bug, get_salient_text.py:27-28) — we use the real end time;
* like the reference, hour fields are ignored for span comparison only in the
  sense that answer spans are "M:SS" strings (lecture videos < 1h); our parser
  still reads full HH:MM:SS timestamps.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional

from mmqg_tpu.data.text_prep import lowercase_subtitle

_TS_RE = re.compile(
    r"(?:(\d+):)?(\d{1,2}):(\d{2})[.,](\d{3})"
)  # [HH:]MM:SS,mmm (srt) or [HH:]MM:SS.mmm (vtt)


@dataclass
class Caption:
    start: float  # seconds
    end: float
    text: str


def _parse_ts(ts: str) -> Optional[float]:
    """None for malformed timestamps — a single bad cue must not abort a
    whole-corpus prep run (the reference's pysrt/webvtt tolerate them too);
    callers skip the cue."""
    m = _TS_RE.search(ts)
    if not m:
        return None
    hh = int(m.group(1) or 0)
    return hh * 3600 + int(m.group(2)) * 60 + int(m.group(3)) + int(m.group(4)) / 1000.0


def parse_srt(text: str) -> List[Caption]:
    captions: List[Caption] = []
    for block in re.split(r"\n\s*\n", text.strip()):
        lines = [ln.strip("﻿").rstrip("\r") for ln in block.splitlines() if ln.strip()]
        if not lines:
            continue
        # optional numeric index line
        if "-->" not in lines[0] and len(lines) >= 2 and "-->" in lines[1]:
            lines = lines[1:]
        if "-->" not in lines[0]:
            continue
        start_s, end_s = [p.strip() for p in lines[0].split("-->")[:2]]
        body = "\n".join(lines[1:])
        start, end = _parse_ts(start_s), _parse_ts(end_s)
        if start is None or end is None:
            continue  # malformed cue: skip, don't abort the corpus
        captions.append(Caption(start, end, body))
    return captions


def parse_vtt(text: str) -> List[Caption]:
    captions: List[Caption] = []
    for block in re.split(r"\n\s*\n", text.strip()):
        lines = [ln.strip("﻿").rstrip("\r") for ln in block.splitlines() if ln.strip()]
        if not lines or lines[0].startswith(("WEBVTT", "NOTE", "STYLE", "REGION")):
            continue
        if "-->" not in lines[0] and len(lines) >= 2 and "-->" in lines[1]:
            lines = lines[1:]  # cue identifier line
        if "-->" not in lines[0]:
            continue
        # vtt allows settings after the end timestamp
        start_s, rest = lines[0].split("-->")
        end_s = rest.strip().split(" ")[0]
        body = "\n".join(lines[1:])
        start, end = _parse_ts(start_s), _parse_ts(end_s)
        if start is None or end is None:
            continue  # malformed cue: skip, don't abort the corpus
        captions.append(Caption(start, end, body))
    return captions


def parse_subtitle_file(path: Path) -> List[Caption]:
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        text = f.read()
    if str(path).endswith(".vtt") or text.lstrip("﻿").startswith("WEBVTT"):
        return parse_vtt(text)
    return parse_srt(text)


def is_important(answer_start: float, answer_end: float, start: float, end: float) -> bool:
    """Span-overlap predicate (reference dataset/get_salient_text.py:9-16)."""
    return (answer_start <= start <= answer_end
            or answer_start <= end <= answer_end
            or start <= answer_start <= end)


def span_seconds(mmss: str) -> int:
    """'M:SS' or 'MM:SS' -> seconds (reference get_salient_text.py:76-79)."""
    m, s = mmss.split(":")
    return int(m) * 60 + int(s)


def extract_context(captions: List[Caption], answer_start: float, answer_end: float) -> Optional[str]:
    """Join cleaned captions overlapping the answer span
    (reference get_salient_text.py:24-56, both branches unified)."""
    sentences = []
    for cap in captions:
        subtitle = lowercase_subtitle(cap.text)
        if subtitle and is_important(answer_start, answer_end, cap.start, cap.end):
            sentences.append(subtitle)
    return " ".join(sentences) if sentences else None


def get_salient_text(question: Dict, subs_path: Path) -> Optional[Dict]:
    """One question record -> {question_id, video_id, question, context, answer}
    (reference dataset/get_salient_text.py:58-90; answer = option_1)."""
    vid = question["video_id"]
    sub_file = None
    for ext in ("srt", "vtt"):
        cand = Path(subs_path) / f"{vid}.{ext}"
        if os.path.exists(cand):
            sub_file = cand
            break
    if sub_file is None:
        return None

    start = span_seconds(question["answer_start"])
    end = span_seconds(question["answer_end"])
    context = extract_context(parse_subtitle_file(sub_file), start, end)
    if context is None:
        return None
    return {
        "question_id": question["question_id"],
        "video_id": vid,
        "question": lowercase_subtitle(question["question"]),
        "context": context,
        "answer": lowercase_subtitle(question["option_1"]),
    }


def build_salient_text_list(questions: List[Dict], subs_path: Path) -> List[Dict]:
    """Whole-corpus sweep (reference get_salient_text.py:92-116 main)."""
    out = []
    for q in questions:
        if len(q.get("question", "")) == 0:
            break  # reference stops at first empty record (:105-106)
        rec = get_salient_text(q, subs_path)
        if rec:
            out.append(rec)
    return out


def assign_question_ids(start_id: int, questions: List[Dict]) -> List[Dict]:
    """Sequential id assignment (reference dataset/assign_question_id.py:3-8)."""
    for i, q in enumerate(questions):
        q["question_id"] = start_id + i
    return questions
