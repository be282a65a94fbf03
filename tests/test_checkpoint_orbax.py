"""Orbax checkpoint backend: round-trip parity with the msgpack backend."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mmqg_tpu import checkpoint as ckpt


@pytest.fixture()
def state():
    params = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.zeros((4,))}
    opt_state = optax.adam(1e-3).init(params)
    return {"params": params, "opt": opt_state,
            "step": jnp.asarray(7, jnp.int32)}


def _zeros_like(tree):
    import jax
    return jax.tree.map(lambda x: jnp.zeros_like(x), tree)


def test_orbax_round_trip(tmp_path, state):
    ckpt.save_checkpoint(tmp_path, "best", state, metadata={"epoch": 3},
                         backend="orbax")
    assert ckpt.has_checkpoint(tmp_path, "best")
    assert (tmp_path / "best.orbax").is_dir()
    restored, meta = ckpt.load_checkpoint(tmp_path, "best",
                                          _zeros_like(state))
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(restored["step"]) == 7
    # optax NamedTuple structure survives (same as msgpack backend)
    assert type(restored["opt"]) is type(state["opt"])


def test_orbax_overwrite_alias(tmp_path, state):
    ckpt.save_checkpoint(tmp_path, "last", state, backend="orbax")
    state2 = {**state, "step": jnp.asarray(9, jnp.int32)}
    ckpt.save_checkpoint(tmp_path, "last", state2, backend="orbax")
    restored, _ = ckpt.load_checkpoint(tmp_path, "last", _zeros_like(state))
    assert int(restored["step"]) == 9


def test_unknown_backend_rejected(tmp_path, state):
    with pytest.raises(ValueError):
        ckpt.save_checkpoint(tmp_path, "x", state, backend="pickle")


def test_msgpack_preferred_when_both_exist(tmp_path, state):
    ckpt.save_checkpoint(tmp_path, "best", state, backend="orbax")
    state2 = {**state, "step": jnp.asarray(11, jnp.int32)}
    ckpt.save_checkpoint(tmp_path, "best", state2, backend="msgpack")
    restored, _ = ckpt.load_checkpoint(tmp_path, "best", _zeros_like(state))
    assert int(restored["step"]) == 11
