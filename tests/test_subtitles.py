from mmqg_tpu.data.subtitles import (extract_context, is_important, parse_srt,
                                     parse_vtt, span_seconds, get_salient_text)

SRT = """1
00:00:01,000 --> 00:00:04,000
Hello there.

2
00:00:05,500 --> 00:00:09,000
Second CAPTION
with newline

3
00:01:00,000 --> 00:01:05,000
Far away caption.
"""

VTT = """WEBVTT

00:00:01.000 --> 00:00:04.000
Hello there.

cue-2
00:00:05.500 --> 00:00:09.000 align:start
Second CAPTION
with newline

NOTE this is a comment

00:01:00.000 --> 00:01:05.000
Far away caption.
"""


def test_parse_srt():
    caps = parse_srt(SRT)
    assert len(caps) == 3
    assert caps[0].start == 1.0 and caps[0].end == 4.0
    assert caps[1].start == 5.5
    assert "newline" in caps[1].text


def test_parse_vtt():
    caps = parse_vtt(VTT)
    assert len(caps) == 3
    assert caps[1].start == 5.5 and caps[1].end == 9.0  # real end, not start
    assert caps[2].start == 60.0


def test_is_important():
    # reference get_salient_text.py:9-16 overlap cases
    assert is_important(10, 20, 15, 25)   # caption starts inside span
    assert is_important(10, 20, 5, 12)    # caption ends inside span
    assert is_important(10, 20, 5, 25)    # caption covers span
    assert not is_important(10, 20, 21, 30)


def test_extract_context():
    caps = parse_srt(SRT)
    ctx = extract_context(caps, 3, 6)
    assert ctx == "hello there. second caption with newline"
    assert extract_context(caps, 200, 300) is None


def test_span_seconds():
    assert span_seconds("1:30") == 90
    assert span_seconds("12:05") == 725


def test_get_salient_text(tmp_path):
    (tmp_path / "v1.srt").write_text(SRT)
    q = {"question_id": 3, "video_id": "v1", "question": "What IS it?",
         "answer_start": "0:02", "answer_end": "0:06", "option_1": "A Thing"}
    rec = get_salient_text(q, tmp_path)
    assert rec["question"] == "what is it?"
    assert rec["answer"] == "a thing"
    assert "hello there." in rec["context"]
    # missing subs -> None (reference get_salient_text.py:66-67)
    q2 = dict(q, video_id="nope")
    assert get_salient_text(q2, tmp_path) is None


def test_parsers_survive_garbage_input():
    """Robustness: malformed subtitle text must yield captions or an empty
    list, never an unhandled exception (real-world srt/vtt files are
    messy; the prep pipeline processes hundreds unattended)."""
    import random
    import string

    from mmqg_tpu.data.subtitles import parse_srt, parse_vtt

    rng = random.Random(0)
    samples = [
        "", "\n\n\n", "WEBVTT", "1\n00:00:01,000 --> garbage\nhello",
        "not a subtitle at all", "1\n\n2\n\n3\n\n",
        "00:00:01.000 --> 00:00:02.000\n",  # vtt cue, no text
        "1\n00:99:99,999 --> 00:00:00,000\nreversed times",
    ]
    for _ in range(30):
        n = rng.randint(0, 200)
        samples.append("".join(rng.choice(string.printable) for _ in range(n)))
    for s in samples:
        for parser in (parse_srt, parse_vtt):
            caps = parser(s)
            assert isinstance(caps, list)
            for c in caps:
                assert c.end >= 0 and c.start >= 0
