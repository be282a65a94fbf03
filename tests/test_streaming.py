import numpy as np
import pytest

from mmqg_tpu.data.dataset import QGDataset
from mmqg_tpu.data.streaming import StreamingLoader


def test_streaming_matches_eager(tiny_config, tiny_corpus):
    """Consume in-loop: yielded media arrays alias two rotating buffers and
    are only valid until the next-next iteration (documented contract)."""
    eager = QGDataset(tiny_config, tiny_config.train_file)
    stream = StreamingLoader(tiny_config, tiny_config.train_file,
                             batch_size=4)
    n = 0
    for e, s in zip(eager.batches(4), stream.batches()):
        n += 1
        np.testing.assert_array_equal(e.context_ids, s.context_ids)
        np.testing.assert_array_equal(e.target_ids, s.target_ids)
        np.testing.assert_array_equal(e.frames_len, s.frames_len)
        np.testing.assert_array_equal(e.frames, s.frames)
        # audio equal within int16 of the same pipeline
        np.testing.assert_array_equal(e.audio_len, s.audio_len)
        np.testing.assert_allclose(e.audio_pcm, s.audio_pcm, atol=1)
        np.testing.assert_array_equal(e.valid, s.valid)
    assert n == eager.num_batches(4)


def test_streaming_shuffle_and_tail_padding(tiny_config, tiny_corpus):
    stream = StreamingLoader(tiny_config, tiny_config.train_file,
                             batch_size=5)
    n = len(stream)
    assert n % 5 != 0, "fixture must produce a genuine partial tail batch"
    # (text fields per batch are fresh copies; only media buffers rotate,
    # so collecting question_id/valid into a list is safe)
    batches = list(stream.batches(shuffle=True,
                                  rng=np.random.default_rng(0)))
    seen = sum(int(b.valid.sum()) for b in batches)
    assert seen == n
    # the tail is padded and masked: exactly n % 5 real rows, the padding
    # rows invalid
    assert int(batches[-1].valid.sum()) == n % 5
    assert not batches[-1].valid[n % 5:].any()
    # shuffling must actually reorder examples vs the unshuffled pass
    order = np.concatenate([b.question_id for b in batches])
    plain = np.concatenate(
        [b.question_id for b in stream.batches(shuffle=False)])
    assert not np.array_equal(order, plain)
    assert sorted(order[:n].tolist()) != order[:n].tolist() or \
        not np.array_equal(order[:n], plain[:n])


def test_local_rows_packs_only_own_block(tiny_config, tiny_corpus):
    """Sharded loading (multihost): a loader given local_rows=(lo, hi) must
    fill media ONLY for that block — its rows bit-equal to the full loader's,
    every other row's media zero (those rows are contributed by the process
    that owns them; parallel/multihost.py assemble_global_batch)."""
    full = StreamingLoader(tiny_config, tiny_config.train_file, batch_size=4)
    part = StreamingLoader(tiny_config, tiny_config.train_file, batch_size=4,
                           local_rows=(1, 3))
    for fb, pb in zip(full.batches(), part.batches()):
        # text fields stay full on every process (host-side BLEU/buckets)
        np.testing.assert_array_equal(fb.context_ids, pb.context_ids)
        np.testing.assert_array_equal(fb.target_ids, pb.target_ids)
        # owned block: identical media
        np.testing.assert_array_equal(fb.frames[1:3], pb.frames[1:3])
        np.testing.assert_array_equal(fb.audio_pcm[1:3], pb.audio_pcm[1:3])
        np.testing.assert_array_equal(fb.frames_len[1:3], pb.frames_len[1:3])
        np.testing.assert_array_equal(fb.audio_len[1:3], pb.audio_len[1:3])
        # foreign rows: never loaded (frames_len floors at 1 by contract)
        assert not pb.frames[0].any() and not pb.frames[3].any()
        assert not pb.audio_pcm[0].any() and not pb.audio_pcm[3].any()
        assert pb.audio_len[0] == pb.audio_len[3] == 0
        assert pb.frames_len[0] == pb.frames_len[3] == 1

    with pytest.raises(ValueError):
        StreamingLoader(tiny_config, tiny_config.train_file, batch_size=4,
                        local_rows=(2, 5))


def test_buffers_rotate_not_alias(tiny_config, tiny_corpus):
    """Consecutive yielded batches must use different media buffers (the
    consumer of batch N holds it while N+1 packs)."""
    stream = StreamingLoader(tiny_config, tiny_config.train_file,
                             batch_size=4)
    it = stream.batches()
    b0 = next(it)
    b1 = next(it)
    assert b0.frames is not b1.frames
    assert b0.audio_pcm is not b1.audio_pcm


def test_trainer_accepts_streaming_loader(tiny_config, tiny_corpus):
    """The StreamingLoader drops into the Trainer (large-corpus training):
    one epoch over the streamed corpus must match the eager QGDataset's
    epoch loss exactly (same data, same shuffle order)."""
    import numpy as np
    from mmqg_tpu.data.dataset import QGDataset
    from mmqg_tpu.data.streaming import StreamingLoader
    from mmqg_tpu.models import qg_model
    from mmqg_tpu.train import Trainer

    emb = np.load(tiny_config.weights_matrix_file).astype(np.float32)

    def build(ds_cls):
        if ds_cls is QGDataset:
            tr = QGDataset(tiny_config, tiny_config.train_file)
            va = QGDataset(tiny_config, tiny_config.val_file)
        else:
            tr = StreamingLoader(tiny_config, tiny_config.train_file,
                                 batch_size=tiny_config.batch_size)
            va = StreamingLoader(tiny_config, tiny_config.val_file,
                                 batch_size=tiny_config.eval_batch_size)
        mc = qg_model.ModelConfig.from_config(
            tiny_config, n_vocab=len(tr.vocab), mode="trimodal")
        return Trainer(tiny_config, mc, emb, tr, va,
                       log_fn=lambda *a, **k: None)

    loss_eager = build(QGDataset).run_epoch(0)
    tr_stream = build(StreamingLoader)
    loss_stream = tr_stream.run_epoch(0)
    assert loss_eager == pytest.approx(loss_stream, rel=1e-5)

    val = tr_stream.validate()
    assert np.isfinite(val["loss"])
