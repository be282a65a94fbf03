"""AV-length bucketing: capped encoders must produce identical decodes to the
full-length path (padding slots carry no information)."""

import jax
import numpy as np
import pytest

from mmqg_tpu import decode as DEC
from mmqg_tpu.data.dataset import QGDataset
from mmqg_tpu.models import qg_model
from mmqg_tpu.train import batch_arrays


@pytest.fixture(scope="module")
def setup(tiny_config, tiny_corpus):
    ds = QGDataset(tiny_config, tiny_config.train_file)
    emb = np.load(tiny_config.weights_matrix_file).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(tiny_config, n_vocab=len(ds.vocab),
                                          mode="trimodal")
    params, state = qg_model.init(jax.random.PRNGKey(0), mc, emb)
    batch = batch_arrays(next(ds.batches(tiny_config.batch_size)))
    return mc, params, state, batch


def test_buckets_cover_need(setup):
    mc, *_ = setup
    av = mc.av_max_length
    assert DEC._bucket(1, av) >= 1
    assert DEC._bucket(av, av) == av
    for g in (4, 8):  # quarter (training short-run option) and eighth grids
        for need in range(1, av + 1):
            b = DEC._bucket(need, av, granularity=g)
            assert need <= b <= av
        assert len({DEC._bucket(n, 101, granularity=g)
                    for n in range(1, 102)}) <= g


def test_capped_decode_matches_full(setup):
    mc, params, state, batch = setup
    rng = jax.random.PRNGKey(0)
    full = DEC.decode_batch(params, state, mc, batch, rng, strategy="greedy",
                            max_len=6, use_pallas=False,
                            audio_cap=mc.av_max_length,
                            frames_cap=mc.av_max_length)
    # tight caps: exactly the batch's true needs
    acap = DEC.audio_bucket(mc, batch["audio_len"])
    fcap = DEC.frames_bucket(mc, batch["frames_len"])
    capped = DEC.decode_batch(params, state, mc, batch, rng,
                              strategy="greedy", max_len=6, use_pallas=False,
                              audio_cap=acap, frames_cap=fcap)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(capped))


def test_buckets_from_host_metadata(setup):
    mc, params, state, batch = setup
    acap = DEC.audio_bucket(mc, batch["audio_len"])
    fcap = DEC.frames_bucket(mc, batch["frames_len"])
    assert 1 <= acap <= mc.av_max_length
    assert 1 <= fcap <= mc.av_max_length
    assert fcap >= int(batch["frames_len"].max())
