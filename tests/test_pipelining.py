"""utils/pipelining.pipelined — the deferred device->host read discipline
used by Trainer.validate and evaluate.evaluate (and inlined in
Trainer.run_epoch). The reference's loops are synchronous per sample
(reference train.py:144, evaluate.py:47); here dispatch runs ahead of
finalize by a bounded lag so the device queue stays fed."""

import pytest

from mmqg_tpu.utils.pipelining import pipelined


def test_results_in_order_and_complete():
    items = list(range(7))
    out = list(pipelined(items, lambda x: x * 10, lambda d, it: (d, it)))
    assert out == [(i * 10, i) for i in items]


def test_dispatch_runs_ahead_by_lag():
    """Before finalize sees item i, dispatch must already have consumed
    items i+1..i+lag (that is the whole point: device work for the next
    batches is enqueued while the host blocks on this one)."""
    log = []

    def dispatch(x):
        log.append(("d", x))
        return x

    def finalize(d, it):
        log.append(("f", it))
        return it

    for lag in (0, 1, 2, 3):
        log.clear()
        n = 6
        assert list(pipelined(range(n), dispatch, finalize, lag=lag)) == \
            list(range(n))
        for i in range(n):
            fin = log.index(("f", i))
            ahead = [x for k, x in log[:fin] if k == "d"]
            # everything up to i+lag was dispatched before i finalised
            assert ahead == list(range(min(i + 1 + lag, n)))


def test_lag_bounds_in_flight_items():
    """At most lag+1 dispatched-but-unfinalised items exist at any moment —
    the buffer contract the streaming loader's three rotating buffers
    depend on (lag=2 -> two live batches while the third packs)."""
    in_flight = 0
    peak = 0

    def dispatch(x):
        nonlocal in_flight, peak
        in_flight += 1
        peak = max(peak, in_flight)
        return x

    def finalize(d, it):
        nonlocal in_flight
        in_flight -= 1
        return it

    list(pipelined(range(10), dispatch, finalize, lag=2))
    assert peak == 3  # lag + the one being handed to finalize


def test_short_iterables_and_empty():
    assert list(pipelined([], lambda x: x, lambda d, it: d, lag=2)) == []
    assert list(pipelined([5], lambda x: x, lambda d, it: d, lag=2)) == [5]


def test_negative_lag_rejected():
    with pytest.raises(ValueError):
        list(pipelined([1], lambda x: x, lambda d, it: d, lag=-1))
