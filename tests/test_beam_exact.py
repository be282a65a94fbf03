"""Beam-search exactness: with beam width >= the candidate space, beam must
return the globally best-scoring sequence (brute-force enumeration oracle)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmqg_tpu import decode as DEC
from mmqg_tpu.data.dataset import QGDataset
from mmqg_tpu.data.vocab import END_ID, PAD_ID, START_ID
from mmqg_tpu.models import decoder as D
from mmqg_tpu.models import qg_model
from mmqg_tpu.train import batch_arrays


@pytest.fixture(scope="module")
def setup(tiny_config, tiny_corpus):
    ds = QGDataset(tiny_config, tiny_config.train_file, load_media=False)
    emb = np.load(tiny_config.weights_matrix_file).astype(np.float32)
    # shrink the vocab by truncating the embedding: brute force is V^L
    V = 6
    mc = qg_model.ModelConfig.from_config(tiny_config, n_vocab=V, mode="text")
    params, state = qg_model.init(jax.random.PRNGKey(0), mc, emb[:V])
    batch = batch_arrays(next(ds.batches(tiny_config.batch_size)))
    batch = {k: v.copy() for k, v in batch.items()}
    batch["context_ids"] = np.clip(batch["context_ids"], 0, V - 1)
    batch["target_ids"] = np.clip(batch["target_ids"], 0, V - 1)
    return mc, params, state, batch, V


def _brute_force_best(params, mc, mem, dec_state, b, V, L):
    """Enumerate all length-<=L sequences for sample b; return the best
    total-logprob sequence under the exact step model."""
    emb_table = params["embedding"]["table"]
    mem_b = D.Memories(*[x[b:b + 1] for x in mem])
    best_score, best_seq = -np.inf, None
    for seq in itertools.product(range(V), repeat=L):
        state = (dec_state[0][:, b:b + 1], dec_state[1][:, b:b + 1])
        tok = jnp.asarray([START_ID], jnp.int32)
        score, out = 0.0, []
        for t in range(L):
            logits, state, _ = D.step(params["decoder"], emb_table, tok,
                                      mem_b, state, train=False,
                                      use_pallas=False, dtype=jnp.float32)
            logp = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32)))[0]
            nxt = seq[t]
            score += logp[nxt]
            out.append(nxt)
            if nxt in (END_ID, PAD_ID):
                # PAD and END are both terminal: the host truncates the
                # returned string at the first of either, so scoring any
                # suffix would rank strings the caller never sees (the
                # device beam stops there too)
                break
            tok = jnp.asarray([nxt], jnp.int32)
        # pad to L for comparison
        out = out + [PAD_ID] * (L - len(out))
        if score > best_score:
            best_score, best_seq = score, out
    return best_score, best_seq


def test_beam_finds_global_optimum(setup):
    mc, params, state, batch, V = setup
    L = 3
    # wide enough to be exact: every length-2 prefix survives
    K = V * V
    mem, dec_state = DEC.encode_jit(params, state, mc, batch,
                                    use_pallas=False)
    toks = np.asarray(DEC.beam_from_memories(
        params, mem, dec_state, max_len=L, beam_size=K, length_penalty=0.0,
        use_pallas=False))

    for b in range(2):  # two samples are plenty (oracle is O(V^L * L))
        score, best = _brute_force_best(params, mc, mem, dec_state, b, V, L)
        assert list(toks[b]) == best, (
            f"sample {b}: beam {list(toks[b])} != brute force {best} "
            f"(score {score:.4f})")
