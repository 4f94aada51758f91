"""Host-side input pipeline with background prefetch.

The reference relies on torch DataLoader worker processes
(`data.py:232-241`). Here: a thread prefetches, collates into bucketed
static shapes, and (optionally) device_puts with the data-parallel
sharding so the next batch is on-device before the step needs it —
hiding host latency behind TPU compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import numpy as np

from .collate import collate_fn, numeric_batch


def batches(
    dataset: Any,
    batch_size: int,
    buckets: Sequence[int],
    *,
    shuffle: bool = False,
    seed: int = 0,
    epoch: int = 0,
    accum: int = 1,
    drop_last: bool = False,
    num_shards: int = 1,
    shard_index: int = 0,
    fixed_bucket: Optional[int] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Collated numeric batches; with accum > 1 the leading axis becomes
    [accum, batch, ...] for in-step gradient accumulation. num_shards /
    shard_index stride the epoch per host (multi-host training).

    ``fixed_bucket`` pads every batch to one static size. REQUIRED for
    multi-host training: each host collates its own stride of the epoch,
    so a per-group bucket choice would give different hosts different
    XLA programs for the same global step (collective mismatch)."""
    from .dataset import iterate_batches

    if fixed_bucket is not None:
        buckets = (fixed_bucket,)
    group = batch_size * accum
    for samples in iterate_batches(
        dataset, group, shuffle=shuffle, seed=seed, epoch=epoch,
        drop_last=drop_last, num_shards=num_shards, shard_index=shard_index,
    ):
        if len(samples) < group:
            if drop_last:
                continue
            # Pad the final group by repeating samples (keeps shapes static).
            samples = list(samples) + [
                samples[i % len(samples)] for i in range(group - len(samples))
            ]
        batch = numeric_batch(collate_fn(samples, buckets=buckets))
        if accum > 1:
            batch = {
                k: v.reshape((accum, batch_size) + v.shape[1:])
                for k, v in batch.items()
            }
        yield batch


def prefetch(
    it: Iterator[Any],
    size: int = 2,
    transform: Optional[Callable[[Any], Any]] = None,
) -> Iterator[Any]:
    """Background-thread prefetch (optionally applying ``transform``, e.g.
    a device_put with sharding)."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err: list = []
    stop = threading.Event()

    def worker():
        try:
            for item in it:
                out = transform(item) if transform else item
                while not stop.is_set():
                    try:
                        q.put(out, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except Exception as e:  # propagate to consumer
            err.append(e)
        finally:
            # The sentinel must use the same stop-aware blocking retry as
            # items: a full queue here only means the consumer is SLOW
            # (the buffer holds `size` items), not gone — a dropped
            # sentinel left the consumer blocked in q.get() forever after
            # draining the buffer, and swallowed worker exceptions.
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.2)
                    break
                except queue.Full:
                    continue

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # Consumer stopped early (break / GeneratorExit): unblock a
        # worker stuck mid-put so it exits and releases its buffered
        # (possibly device-resident) batches instead of living forever.
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
