import numpy as np
import pytest

from mmqg_tpu.data.dataset import QGDataset
from mmqg_tpu.models import qg_model
from mmqg_tpu.pipeline import QGPipeline
from mmqg_tpu.train import Trainer


@pytest.fixture(scope="module")
def trained(tiny_config, tiny_corpus, tmp_path_factory):
    cfg = tiny_config.replace(
        output_path=tmp_path_factory.mktemp("pipe") / "results", lr=5e-3)
    cfg.ensure_dirs()
    train_ds = QGDataset(cfg, cfg.train_file)
    val_ds = QGDataset(cfg, cfg.val_file)
    emb = np.load(cfg.weights_matrix_file).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(cfg, n_vocab=len(train_ds.vocab),
                                          mode="trimodal")
    tr = Trainer(cfg, mc, emb, train_ds, val_ds, log_fn=lambda *a: None)
    tr.fit(epochs=1)
    return cfg


def test_pipeline_generate_all_strategies(trained):
    pipe = QGPipeline.from_checkpoint(trained, alias="best")
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (2, trained.frame_size, trained.frame_size, 3),
                         np.uint8)
    pcm = (rng.randn(trained.audio_sample_rate) * 3000).astype(np.int16)
    contexts = ["what is the process of the system",
                "the value of the function is the result"]
    for strategy in ("greedy", "sampling", "beam"):
        out = pipe.generate(contexts, frames=[frames, None],
                            audio=[pcm, None], strategy=strategy)
        assert len(out) == 2
        assert all(isinstance(s, str) for s in out)


def test_pipeline_text_only(trained):
    pipe = QGPipeline.from_checkpoint(trained, alias="last", mode="trimodal")
    out = pipe.generate(["the system is a model of the process"])
    assert len(out) == 1


def test_unknown_words_are_skipped(trained):
    pipe = QGPipeline.from_checkpoint(trained)
    out = pipe.generate(["zzzunknown the process zzzalso"])
    assert len(out) == 1  # no KeyError on OOV input words


# The mesh-backed pipeline tests (sharded serving / data-parallel evaluate
# from a trained checkpoint) live in parallel_cases.py: EVERY test that runs
# XLA:CPU collectives must be in the isolated child suite, or its known
# rendezvous abort (NOTES_NEXT_ROUND.md "Known flake") can kill the whole
# pytest process when this 1-core box is loaded.


def test_generate_from_video_end_to_end(trained, tmp_path):
    """Raw-video -> questions (the north star's wording): one mp4 decode,
    span-sliced frames + audio, subtitle-derived contexts, jitted decode.
    ffmpeg is absent in this image so the audio track is passed as a wav
    (the reference's get_audio.py artifact layout)."""
    cv2 = pytest.importorskip("cv2")
    from mmqg_tpu.data import wav as wavio

    fps, seconds, size = 10, 6, (64, 48)
    video = tmp_path / "vid.mp4"
    vw = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"),
                         fps, size)
    assert vw.isOpened()
    for i in range(seconds * fps):
        vw.write(np.full((size[1], size[0], 3), (i * 3) % 255, np.uint8))
    vw.release()

    rate = trained.audio_sample_rate
    pcm = (0.2 * np.sin(np.linspace(0, 80 * np.pi, seconds * rate))
           ).astype(np.float32)
    track = tmp_path / "vid.wav"
    wavio.write_wav(track, pcm, rate)

    subs = tmp_path / "vid.srt"
    subs.write_text(
        "1\n00:00:00,000 --> 00:00:03,000\nWhat is the process\n\n"
        "2\n00:00:03,000 --> 00:00:06,000\nthe value of the system\n\n")

    pipe = QGPipeline.from_checkpoint(trained, alias="best")
    out = pipe.generate_from_video(
        video, spans=[(1.0, 3.0), ("0:03", "0:05")],  # seconds AND "M:SS"
        subtitles=subs, audio_path=track, strategy="greedy")
    assert len(out) == 2
    assert all(isinstance(s, str) for s in out)

    # context extraction picked the overlapping captions per span
    out2 = pipe.generate_from_video(
        video, spans=[(1.0, 3.0)], contexts=["what is the process"],
        audio_path=track)
    assert len(out2) == 1


def test_generate_from_av_mp4_no_external_binary(trained, tmp_path,
                                                 monkeypatch):
    """The full north-star path from ONE mp4 carrying both streams: video
    frames AND the audio track come out of the same file via the native
    in-process decoder — no wav sidecar, no ffmpeg binary (hidden via
    monkeypatch to prove it)."""
    import shutil as _shutil

    pytest.importorskip("cv2")
    from mmqg_tpu.data import native

    if not native.media_available():
        pytest.skip("native media lib unavailable")
    video = tmp_path / "lecture.mp4"
    if not native.write_test_av_mp4(video, seconds=6.0, freq=440, fps=10):
        pytest.skip("AAC/MPEG-4 encoders not built into system libavcodec")

    monkeypatch.setattr(_shutil, "which", lambda *_: None)
    pipe = QGPipeline.from_checkpoint(trained, alias="best")
    out = pipe.generate_from_video(
        video, spans=[(1.0, 3.0), ("0:03", "0:05")],
        contexts=["what is the process", "the value of the system"],
        strategy="greedy")
    assert len(out) == 2
    assert all(isinstance(s, str) for s in out)


def test_pack_buckets_batch_sizes(trained):
    """Request-batch sizes bucket to powers of two so serving sees at most
    log2(max_batch) compiled programs, not one per distinct size."""
    pipe = QGPipeline.from_checkpoint(trained, alias="best")
    for n, rows in ((1, 1), (2, 2), (3, 4), (5, 8), (8, 8)):
        batch = pipe._pack(["what is the value"] * n, None, None)
        assert batch["context_ids"].shape[0] == rows, (n, rows)
        assert batch["valid"][:n].all() and not batch["valid"][n:].any()
        assert (batch["context_len"] >= 1).all()  # masked softmax safety

    out = pipe.generate(["what is the value of the function",
                         "the process of the system is the result",
                         "how is the data model part"], strategy="greedy")
    assert len(out) == 3
    assert all(isinstance(s, str) for s in out)


def test_pipeline_resnet_backbone(tiny_config, tiny_corpus,
                                  tmp_path_factory):
    """Serving with video_encoder='resnet': a checkpoint trained with the
    R(2+1)D backbone reconstructs from its config snapshot (the snapshot
    records the knob) and generates on frames through QGPipeline."""
    cfg = tiny_config.replace(
        output_path=tmp_path_factory.mktemp("pipe_resnet") / "results",
        video_encoder="resnet")
    cfg.ensure_dirs()
    train_ds = QGDataset(cfg, cfg.train_file)
    val_ds = QGDataset(cfg, cfg.val_file)
    emb = np.load(cfg.weights_matrix_file).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(cfg, n_vocab=len(train_ds.vocab),
                                          mode="text_video")
    tr = Trainer(cfg, mc, emb, train_ds, val_ds, log_fn=lambda *a: None)
    tr.fit(epochs=1)

    pipe = QGPipeline.from_checkpoint(cfg, alias="best", mode="text_video")
    assert pipe.mc.video_encoder == "resnet"
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (2, cfg.frame_size, cfg.frame_size, 3),
                         np.uint8)
    out = pipe.generate(["what is the process of the system"],
                        frames=[frames], strategy="greedy")
    assert len(out) == 1 and isinstance(out[0], str)


def test_generate_from_videos_overlapped_matches_sequential(trained, tmp_path):
    """The overlapped multi-video driver (generate_from_videos: thread-pool
    prep, completion-order dispatch) must return exactly what per-video
    generate_from_video returns, in job order."""
    pytest.importorskip("cv2")
    from mmqg_tpu.data import native

    if not native.media_available():
        pytest.skip("native media lib unavailable")
    jobs = []
    for v in range(3):
        video = tmp_path / f"lec{v}.mp4"
        if not native.write_test_av_mp4(video, seconds=6.0, freq=300 + 100 * v,
                                        fps=10):
            pytest.skip("AAC/MPEG-4 encoders not built into libavcodec")
        jobs.append({"video_path": video,
                     "spans": [(1.0, 3.0), (3.0, 5.0)],
                     "contexts": ["what is the process",
                                  "the value of the system"]})

    pipe = QGPipeline.from_checkpoint(trained, alias="best")
    sequential = [pipe.generate_from_video(j["video_path"], j["spans"],
                                           contexts=j["contexts"])
                  for j in jobs]
    overlapped = pipe.generate_from_videos(jobs, workers=3)
    assert overlapped == sequential
    assert all(len(qs) == 2 for qs in overlapped)


def test_generate_from_videos_coalesced_matches_per_video(trained, tmp_path):
    """The coalescing driver (generate_from_videos(coalesce=True): many
    videos' questions packed per dispatched batch — the corpus-density
    throughput mode, PERF.md round-4 joint table) must return exactly the
    per-video results in job order, report a completion time for every job,
    and respect max_coalesce chunking."""
    pytest.importorskip("cv2")
    from mmqg_tpu.data import native

    if not native.media_available():
        pytest.skip("native media lib unavailable")
    jobs = []
    for v in range(3):
        video = tmp_path / f"co{v}.mp4"
        if not native.write_test_av_mp4(video, seconds=6.0,
                                        freq=300 + 100 * v, fps=10):
            pytest.skip("AAC/MPEG-4 encoders not built into libavcodec")
        jobs.append({"video_path": video,
                     "spans": [(1.0, 3.0), (3.0, 5.0)],
                     "contexts": ["what is the process",
                                  "the value of the system"]})

    pipe = QGPipeline.from_checkpoint(trained, alias="best")
    per_video = pipe.generate_from_videos(jobs, workers=3)
    times = {}
    coalesced = pipe.generate_from_videos(jobs, workers=3, coalesce=True,
                                          completion_times=times)
    assert coalesced == per_video
    assert set(times) == {0, 1, 2}
    # max_coalesce=1 degenerates to one dispatch per question, same output
    chunked = pipe.generate_from_videos(jobs, workers=3, coalesce=True,
                                        max_coalesce=1)
    assert chunked == per_video

    # SAMPLING too (round-4 VERDICT weak #1): per-row PRNG streams keyed by
    # (job, span) make the draw independent of batch composition, so the
    # coalesced batches — whatever their membership — reproduce the
    # per-video outputs exactly
    per_video_s = pipe.generate_from_videos(jobs, workers=3,
                                            strategy="sampling", seed=7)
    coalesced_s = pipe.generate_from_videos(jobs, workers=3, coalesce=True,
                                            strategy="sampling", seed=7)
    assert coalesced_s == per_video_s


def test_sampling_independent_of_batch_composition(trained):
    """A sampled request's draw must not change with who it was batched
    with: the row's stream is keyed by (seed, row_seed), not by batch
    position or size (round-4 VERDICT weak #1)."""
    pipe = QGPipeline.from_checkpoint(trained, alias="best")
    contexts = ["what is the process of the system",
                "the value of the function is the result",
                "how is the data model part"]
    for strategy, kw in (("sampling", {}), ("topk", {"topk": 3}),
                         ("topp", {"top_p": 0.8})):
        batched = pipe.generate(contexts, strategy=strategy, seed=3,
                                row_seeds=[100, 200, 300], **kw)
        # the same logical request served alone (different batch bucket,
        # different position) draws identically
        alone = pipe.generate([contexts[1]], strategy=strategy, seed=3,
                              row_seeds=[200], **kw)
        assert alone[0] == batched[1], strategy


def test_generate_from_videos_fault_isolation(trained, tmp_path):
    """One bad mp4 must cost only its own job (round-4 VERDICT missing #2):
    N jobs with one missing and one truncated file -> N-2 answer lists +
    two error slots, in BOTH per-video and coalesced modes; the good jobs'
    outputs are unchanged vs a run without the bad jobs."""
    pytest.importorskip("cv2")
    from mmqg_tpu.data import native

    if not native.media_available():
        pytest.skip("native media lib unavailable")
    good_jobs = []
    for v in range(2):
        video = tmp_path / f"ok{v}.mp4"
        if not native.write_test_av_mp4(video, seconds=6.0,
                                        freq=300 + 100 * v, fps=10):
            pytest.skip("AAC/MPEG-4 encoders not built into libavcodec")
        good_jobs.append({"video_path": video,
                          "spans": [(1.0, 3.0), (3.0, 5.0)],
                          "contexts": ["what is the process",
                                       "the value of the system"]})
    truncated = tmp_path / "trunc.mp4"
    truncated.write_bytes((tmp_path / "ok0.mp4").read_bytes()[:200])
    jobs = [good_jobs[0],
            {"video_path": tmp_path / "missing.mp4", "spans": [(0.0, 1.0)],
             "contexts": ["what is the value"]},
            good_jobs[1],
            {"video_path": truncated, "spans": [(1.0, 3.0)],
             "contexts": ["what is the value"]},
            {"video_path": good_jobs[0]["video_path"]}]  # malformed: no spans

    pipe = QGPipeline.from_checkpoint(trained, alias="best")
    baseline = pipe.generate_from_videos(good_jobs, workers=2)
    for coalesce in (False, True):
        errs: dict = {}
        out = pipe.generate_from_videos(jobs, workers=2, errors=errs,
                                        coalesce=coalesce)
        assert [out[0], out[2]] == baseline, f"coalesce={coalesce}"
        assert out[1] is None and out[3] is None and out[4] is None
        assert set(errs) == {1, 3, 4} and all(errs.values())
    # without an errors dict the failure is a warning, not an exception
    with pytest.warns(RuntimeWarning, match="job 1 failed"):
        out = pipe.generate_from_videos([good_jobs[0], jobs[1]], workers=2)
    assert out[0] == baseline[0] and out[1] is None


def test_generate_from_videos_coalesced_mixed_buckets(trained, tmp_path):
    """Bucket-grouped coalescing must restore each job's SPAN ORDER even
    when one job's spans land in different AV-bucket groups (short + long
    span in the same video), and still equal the per-video results."""
    pytest.importorskip("cv2")
    from mmqg_tpu.data import native

    if not native.media_available():
        pytest.skip("native media lib unavailable")
    jobs = []
    for v in range(2):
        video = tmp_path / f"fx{v}.mp4"
        if not native.write_test_av_mp4(video, seconds=8.0,
                                        freq=300 + 100 * v, fps=10):
            pytest.skip("AAC/MPEG-4 encoders not built into libavcodec")
        # span 0 is short (1 s ≈ 1 frame), span 1 long (6 s): different
        # frames/audio buckets at the tiny config's av_max, so the two
        # questions of ONE job ride DIFFERENT coalesced batches
        jobs.append({"video_path": video,
                     "spans": [(1.0, 2.0), (1.5, 7.5)],
                     "contexts": ["what is the process",
                                  "the value of the system"]})

    pipe = QGPipeline.from_checkpoint(trained, alias="best")
    per_video = pipe.generate_from_videos(jobs, workers=2)
    grouped = pipe.generate_from_videos(jobs, workers=2, coalesce=True,
                                        max_coalesce=8)
    assert grouped == per_video
