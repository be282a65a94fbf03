"""Host-loop pipelining: defer device->host reads to keep the device fed.

On a latency-bound backend every device->host materialisation costs a full
round trip (~30 ms on this environment's tunnel); a loop that dispatches
batch i and immediately fetches its results serialises the host loop with
device compute. Dispatching ahead by a small fixed lag overlaps batch i's
fetch with the dispatch of i+1..i+lag while bounding how many input buffers
are in flight. Measured wins at reference dims (PERF.md): 1.55x on the
training epoch (scripts/probe_epoch_sync_lag.py, the same discipline
inlined in Trainer.run_epoch) and 1.25x on the serving decode (bench.py's
queued 94 ms/batch vs serial-synced 118 ms p50 — the identical program,
differing only in whether the host blocks between dispatches).

The lag default of 2 matches the streaming loader's buffer contract: three
rotating host buffers (data/streaming.py) allow exactly two dispatched
batches to stay live while the third packs.

The reference has no analogue — its loops are per-sample and synchronous
(reference train.py:144, evaluate.py:47)."""

from collections import deque
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")
D = TypeVar("D")
R = TypeVar("R")


def pipelined(items: Iterable[T],
              dispatch: Callable[[T], D],
              finalize: Callable[[D, T], R],
              lag: int = 2) -> Iterator[R]:
    """Yield ``finalize(dispatch(item), item)`` for every item, in order,
    with ``dispatch`` running up to ``lag`` items ahead of ``finalize``.

    ``dispatch`` should enqueue device work and return without blocking
    (jit calls are asynchronous); ``finalize`` does the blocking
    device->host reads and any host-side postprocessing. ``lag=0`` is the
    plain synchronous loop."""
    if lag < 0:
        raise ValueError(f"lag must be >= 0, got {lag}")
    pending: "deque" = deque()
    for item in items:
        pending.append((dispatch(item), item))
        if len(pending) > lag:
            d, it = pending.popleft()
            yield finalize(d, it)
    while pending:
        d, it = pending.popleft()
        yield finalize(d, it)
