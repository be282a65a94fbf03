"""Serving daemon: JSONL in -> micro-batched decode -> JSONL out."""

import io
import json

import numpy as np
import pytest

from mmqg_tpu.data.dataset import QGDataset
from mmqg_tpu.models import qg_model
from mmqg_tpu.pipeline import QGPipeline
from mmqg_tpu.serve import serve
from mmqg_tpu.train import Trainer


@pytest.fixture(scope="module")
def served_pipe(tiny_config, tiny_corpus, tmp_path_factory):
    cfg = tiny_config.replace(
        output_path=tmp_path_factory.mktemp("serve") / "results", lr=5e-3)
    cfg.ensure_dirs()
    train_ds = QGDataset(cfg, cfg.train_file)
    val_ds = QGDataset(cfg, cfg.val_file)
    emb = np.load(cfg.weights_matrix_file).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(cfg, n_vocab=len(train_ds.vocab),
                                          mode="trimodal")
    Trainer(cfg, mc, emb, train_ds, val_ds, log_fn=lambda *a: None).fit(1)
    return QGPipeline.from_checkpoint(cfg, alias="best"), cfg


def test_serve_batches_and_answers(served_pipe, tmp_path):
    pipe, cfg = served_pipe
    rng = np.random.RandomState(0)
    frames_path = tmp_path / "f.npy"
    np.save(frames_path, rng.randint(
        0, 256, (2, cfg.frame_size, cfg.frame_size, 3), np.uint8))
    from mmqg_tpu.data import wav as wavio
    wav_path = tmp_path / "a.wav"
    wavio.write_wav(wav_path, (rng.randn(cfg.audio_sample_rate) * 3000)
                    .astype(np.int16), cfg.audio_sample_rate)

    reqs = [
        {"id": 1, "context": "what is the process of the system",
         "frames_npy": str(frames_path), "audio_wav": str(wav_path)},
        {"id": "two", "context": "the value of the function is the result"},
        {"id": 3, "context": "bad media", "frames_npy": "/nonexistent.npy"},
    ]
    inp = io.StringIO("\n".join(json.dumps(r) for r in reqs) + "\n")
    out = io.StringIO()
    n = serve(pipe, strategy="greedy", max_batch=8, linger_ms=200,
              inp=inp, out=out)
    assert n == 3
    responses = [json.loads(l) for l in out.getvalue().splitlines()]
    by_id = {r["id"]: r for r in responses}
    assert isinstance(by_id[1]["question"], str)
    assert isinstance(by_id["two"]["question"], str)
    assert by_id[1]["batch_size"] == 2       # bad request excluded
    assert "error" in by_id[3]
    assert by_id[1]["latency_ms"] > 0


def test_serve_malformed_line(served_pipe):
    pipe, cfg = served_pipe
    inp = io.StringIO('{"id": 1, "context": "what is the value"}\nnot json\n')
    out = io.StringIO()
    n = serve(pipe, strategy="greedy", max_batch=8, linger_ms=200,
              inp=inp, out=out)
    assert n == 2
    responses = [json.loads(l) for l in out.getvalue().splitlines()]
    assert any("question" in r for r in responses)
    assert any("error" in r for r in responses)


def test_serve_pipelines_batches(served_pipe):
    """Two waves of requests: the loop dispatches wave N+1 while wave N is
    in flight; all responses must still arrive, correctly attributed."""
    pipe, cfg = served_pipe
    lines = [json.dumps({"id": i, "context": "what is the value of the part"})
             for i in range(6)]
    inp = io.StringIO("\n".join(lines) + "\n")
    out = io.StringIO()
    n = serve(pipe, strategy="greedy", max_batch=2, linger_ms=5,
              inp=inp, out=out)
    assert n == 6
    responses = [json.loads(l) for l in out.getvalue().splitlines()]
    assert sorted(r["id"] for r in responses) == list(range(6))
    assert all("question" in r for r in responses)


def test_serve_poisoned_batch_isolates_request(served_pipe, tmp_path):
    """A request whose media loads but breaks batch packing must error alone
    (per-request fallback), with the good requests still answered."""
    pipe, cfg = served_pipe
    bad = tmp_path / "wrong_geometry.npy"
    np.save(bad, np.zeros((2, 224, 224, 3), np.uint8))  # wrong H/W
    reqs = [
        {"id": "good", "context": "what is the value"},
        {"id": "poison", "context": "the process", "frames_npy": str(bad)},
    ]
    inp = io.StringIO("\n".join(json.dumps(r) for r in reqs) + "\n")
    out = io.StringIO()
    serve(pipe, strategy="greedy", max_batch=8, linger_ms=100,
          inp=inp, out=out)
    by_id = {r["id"]: r for r in
             (json.loads(l) for l in out.getvalue().splitlines())}
    assert "question" in by_id["good"]
    assert "error" in by_id["poison"]


def test_serve_raw_video_request(served_pipe, tmp_path):
    """The daemon's raw-video request form: one mp4 carrying both streams,
    span + subtitles in the request — frames, audio, and context all resolve
    host-side through the generate_from_video prep path, then join a normal
    micro-batch with a staged-media request."""
    from mmqg_tpu.data import native

    pytest.importorskip("cv2")
    if not native.media_available():
        pytest.skip("native media lib unavailable")
    pipe, cfg = served_pipe
    video = tmp_path / "lec.mp4"
    if not native.write_test_av_mp4(video, seconds=6.0, freq=440, fps=10):
        pytest.skip("AAC/MPEG-4 encoders not built into system libavcodec")
    subs = tmp_path / "lec.srt"
    subs.write_text(
        "1\n00:00:00,000 --> 00:00:06,000\nthe process of the system\n\n")

    reqs = [
        {"id": "vid", "video": str(video), "span": ["0:01", "0:04"],
         "subtitles": str(subs)},
        {"id": "txt", "context": "the value of the function"},
    ]
    inp = io.StringIO("\n".join(json.dumps(r) for r in reqs) + "\n")
    out = io.StringIO()
    n = serve(pipe, strategy="greedy", max_batch=8, linger_ms=200,
              inp=inp, out=out)
    assert n == 2
    by_id = {r["id"]: r for r in
             (json.loads(l) for l in out.getvalue().splitlines())}
    assert isinstance(by_id["vid"]["question"], str)
    assert by_id["vid"]["batch_size"] == 2   # both forms share one batch
    assert isinstance(by_id["txt"]["question"], str)


def test_serve_zero_linger_batches_backlog(served_pipe):
    """linger_ms=0 must still batch requests that are ALREADY queued (the
    non-blocking backlog drain): under load the queue backs up while the
    device decodes, and shipping the backlog one-by-one saturates at the
    per-program dispatch floor (PERF.md "Serving daemon under load"). With
    32 instantly-available requests and max_batch=8, at least one batch
    must carry companions."""
    pipe, cfg = served_pipe
    reqs = [{"id": i, "context": "what is the process of the system"}
            for i in range(32)]
    inp = io.StringIO("\n".join(json.dumps(r) for r in reqs) + "\n")
    out = io.StringIO()
    n = serve(pipe, strategy="greedy", max_batch=8, linger_ms=0.0,
              inp=inp, out=out)
    assert n == 32
    responses = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(responses) == 32
    assert max(r["batch_size"] for r in responses) >= 2
