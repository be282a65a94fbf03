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
    batches = list(stream.batches(shuffle=True,
                                  rng=np.random.default_rng(0)))
    n = len(stream)
    seen = sum(int(b.valid.sum()) for b in batches)
    assert seen == n
    assert batches[-1].valid.sum() <= 5


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
