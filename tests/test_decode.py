import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmqg_tpu import decode as DEC
from mmqg_tpu.data.dataset import QGDataset
from mmqg_tpu.data.vocab import END_ID, PAD_ID
from mmqg_tpu.models import qg_model
from mmqg_tpu.train import batch_arrays


@pytest.fixture(scope="module")
def setup(tiny_config, tiny_corpus):
    ds = QGDataset(tiny_config, tiny_config.train_file)
    emb = np.load(tiny_config.weights_matrix_file).astype(np.float32)
    mc = qg_model.ModelConfig.from_config(tiny_config, n_vocab=len(ds.vocab),
                                          mode="text")
    params, state = qg_model.init(jax.random.PRNGKey(0), mc, emb)
    batch = batch_arrays(next(ds.batches(tiny_config.batch_size)))
    return mc, params, state, batch, ds


def test_greedy_is_deterministic(setup):
    mc, params, state, batch, ds = setup
    rng = jax.random.PRNGKey(0)
    t1 = DEC.decode_batch(params, state, mc, batch, rng, strategy="greedy",
                          max_len=6, use_pallas=False)
    t2 = DEC.decode_batch(params, state, mc, batch, jax.random.PRNGKey(9),
                          strategy="greedy", max_len=6, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert t1.shape == (batch["context_ids"].shape[0], 6)


def test_end_token_stops_generation(setup):
    """After an emitted <end>, every later position must be PAD. A random
    init may never emit <end>, so FORCE it: bias the vocab projection so
    <end> wins from step 2 onward would be shape-dependent — instead make
    <end> the argmax always; every row must be [<end>, PAD, PAD, ...]."""
    import jax.numpy as jnp

    mc, params, state, batch, ds = setup
    forced = jax.tree.map(lambda x: x, params)  # shallow copy of the pytree
    b = np.asarray(forced["decoder"]["out"]["b"]).copy()
    b[END_ID] += 50.0
    forced = {**forced, "decoder": {**forced["decoder"],
                                    "out": {**forced["decoder"]["out"],
                                            "b": jnp.asarray(b)}}}
    toks = np.asarray(DEC.decode_batch(forced, state, mc, batch,
                                       jax.random.PRNGKey(0), max_len=6,
                                       use_pallas=False))
    assert (toks[:, 0] == END_ID).all()
    assert (toks[:, 1:] == PAD_ID).all()


def test_sampling_and_topk_run(setup):
    mc, params, state, batch, ds = setup
    for strat, k in (("sampling", 1), ("topk", 3)):
        toks = DEC.decode_batch(params, state, mc, batch,
                                jax.random.PRNGKey(1), strategy=strat,
                                max_len=6, k=k, use_pallas=False)
        assert toks.shape == (batch["context_ids"].shape[0], 6)


def test_topp_nucleus_semantics():
    """Nucleus sampling draws ONLY from the smallest prefix of the sorted
    distribution reaching mass p, with renormalised frequencies; p→0
    degenerates to greedy, p=1.0 covers the full support."""
    rng = jax.random.PRNGKey(0)
    logits = jnp.asarray(
        np.log(np.array([[0.5, 0.3, 0.15, 0.04, 0.01]], np.float32)))

    def pick(tag, i, p):
        return int(DEC._select_token(
            "topp", logits, jax.random.fold_in(rng, tag + i), 1, p)[0])

    toks = np.array([pick(0, i, 0.7) for i in range(400)])
    counts = np.bincount(toks, minlength=5)
    assert counts[2:].sum() == 0          # nucleus at p=0.7 is {0, 1}
    assert abs(counts[0] / 400 - 0.5 / 0.8) < 0.08   # renormalised freq
    full = np.bincount([pick(1000, i, 1.0) for i in range(800)], minlength=5)
    assert (full > 0).all()               # p=1.0 keeps the full support
    assert {pick(2000, i, 0.01) for i in range(50)} == {0}  # p→0 == greedy


def test_topp_decode_batch_runs(setup):
    mc, params, state, batch, ds = setup
    toks = DEC.decode_batch(params, state, mc, batch, jax.random.PRNGKey(1),
                            strategy="topp", p=0.9, max_len=6,
                            use_pallas=False)
    assert toks.shape == (batch["context_ids"].shape[0], 6)


def test_topk1_equals_greedy(setup):
    mc, params, state, batch, ds = setup
    g = DEC.decode_batch(params, state, mc, batch, jax.random.PRNGKey(0),
                         strategy="greedy", max_len=6, use_pallas=False)
    t = DEC.decode_batch(params, state, mc, batch, jax.random.PRNGKey(0),
                         strategy="topk", k=1, max_len=6, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(t))


def test_beam_runs_and_beats_greedy_likelihood(setup):
    """Beam-1 == greedy; beam-4 sequence log-prob >= greedy's."""
    mc, params, state, batch, ds = setup
    g = np.asarray(DEC.decode_batch(params, state, mc, batch,
                                    jax.random.PRNGKey(0), max_len=6,
                                    use_pallas=False))
    b1 = np.asarray(DEC.beam_decode_batch(params, state, mc, batch,
                                          max_len=6, beam_size=1,
                                          length_penalty=0.0,
                                          use_pallas=False))
    np.testing.assert_array_equal(g, b1)
    b4 = DEC.beam_decode_batch(params, state, mc, batch, max_len=6,
                               beam_size=4, use_pallas=False)
    assert b4.shape == g.shape


def test_sequence_logprob_matches_stepwise_oracle(setup):
    """The scanned rescoring API must equal a per-step python-loop rescore
    (log-softmax mass of each token up to and incl. the first END/PAD)."""
    import jax.numpy as jnp

    from mmqg_tpu.data.vocab import START_ID
    from mmqg_tpu.models import decoder as D

    mc, params, state, batch, ds = setup
    toks = np.asarray(DEC.decode_batch(params, state, mc, batch,
                                       jax.random.PRNGKey(3),
                                       strategy="sampling", max_len=5,
                                       use_pallas=False))
    got = np.asarray(DEC.sequence_logprob(params, state, mc, batch,
                                          jnp.asarray(toks),
                                          use_pallas=False,
                                          dtype=jnp.float32))

    mem, dec_state = DEC.encode_jit(params, state, mc, batch, False, None,
                                    None, jnp.float32)
    B = toks.shape[0]
    cur = jnp.full((B,), START_ID, jnp.int32)
    total = np.zeros(B)
    done = np.zeros(B, bool)
    for t in range(toks.shape[1]):
        logits, dec_state, _ = D.step(params["decoder"],
                                      params["embedding"]["table"], cur, mem,
                                      dec_state, train=False,
                                      use_pallas=False, dtype=jnp.float32)
        lp = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), -1))
        for b in range(B):
            if not done[b]:
                total[b] += lp[b, toks[b, t]]
                if toks[b, t] in (END_ID, PAD_ID):
                    done[b] = True
        cur = jnp.asarray(toks[:, t])
    np.testing.assert_allclose(got, total, rtol=1e-5, atol=1e-5)


def test_tokens_to_words(setup):
    mc, params, state, batch, ds = setup
    toks = np.array([[3, 4, END_ID, PAD_ID], [3, PAD_ID, PAD_ID, PAD_ID]])
    words = DEC.tokens_to_words(toks, ds.index_to_word)
    assert len(words) == 2
    assert all(isinstance(w, str) for w in words[0])
    assert len(words[0]) == 2  # trimmed at <end>
    assert len(words[1]) == 1


def test_fused_program_matches_split(setup):
    """decode_batch_fused (one XLA program) must produce the same tokens as
    the two-program decode_batch composition."""
    mc, params, state, batch, _ = setup
    rng = jax.random.PRNGKey(3)
    split = DEC.decode_batch(params, state, mc, batch, rng,
                             strategy="greedy", max_len=8, use_pallas=False)
    fused = DEC.decode_batch_fused(params, state, mc, batch, rng,
                                   strategy="greedy", max_len=8,
                                   use_pallas=False)
    np.testing.assert_array_equal(np.asarray(split), np.asarray(fused))
