"""Double-buffered host -> device batch prefetch.

TPU-native replacement for the reference's DataLoader worker knobs
(``graph_kernel.py:332-334,515-519``): a background thread assembles the
next host batch (native C++ packer) and starts its ``device_put`` while
the current step runs, so input-pipeline latency hides behind device
compute (SURVEY.md section 7.1, "double-buffered host->HBM prefetch").
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax

_SENTINEL = object()


def prefetch_to_device(
    batches: Iterable[dict],
    size: int = 2,
    put: Optional[Callable] = None,
) -> Iterator[dict]:
    """Iterate ``batches``, staging ``size`` of them ahead on device.

    ``put`` maps a host batch to device arrays (e.g. ``shard_batch`` for a
    mesh, or plain ``jax.device_put``); default is ``jax.device_put``.
    Exceptions in the producer thread re-raise at the consuming site.
    """
    put = put or jax.device_put
    # queue.Queue(maxsize=0) means UNBOUNDED in Python — a user passing
    # --prefetch_factor 0 to "disable" prefetching would instead stage the
    # whole epoch onto the device. Floor at 1 (minimal lookahead).
    q: "queue.Queue" = queue.Queue(maxsize=max(1, size))

    def producer():
        try:
            for batch in batches:
                q.put(put(batch))
        except BaseException as e:  # propagate to consumer
            q.put(e)
            return
        q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
    thread.join()
