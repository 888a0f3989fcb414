"""Host->device feed: threaded batch assembly with double-buffered prefetch.

Replaces torch DataLoader workers (num_workers=8, persistent_workers — e.g.
src/datasets/classification.py:223-231) with a thread pool that assembles
uint8 numpy batches while the device computes, plus ``jax.device_put``
prefetch so the next batch is already on-chip when the step function needs
it. Augmentation happens on device (augment.py), so host work is only
decode/resize (cached after the first epoch) and collation.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np


def collate(items):
    """Stack item dicts into a batch dict of arrays (strings to lists)."""
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]) or isinstance(vals[0], (int, float)):
            out[k] = np.stack([np.asarray(v) for v in vals])
        else:
            out[k] = vals
    return out


def batches(dataset, batch_size: int, *, shuffle: bool, drop_last: bool,
            seed: int | None = None, workers: int = 8,
            skip_batches: int = 0):
    """Yield collated batches; item loading is parallelised across threads.

    ``skip_batches`` drops the first N batches at the INDEX level — no
    item is decoded for them. Mid-epoch resume uses this to replay the
    seeded order from position N for free (same seed -> same order, so the
    skipped prefix is exactly what the preempted run already consumed).
    """
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    limit = (n // batch_size) * batch_size if drop_last else n
    first = skip_batches * batch_size
    if workers <= 0:  # synchronous load (reference num_workers=0 semantics)
        for start in range(first, limit, batch_size):
            idxs = order[start:start + batch_size]
            if len(idxs) == 0:
                break
            yield collate([dataset[i] for i in idxs])
        return
    with ThreadPoolExecutor(max_workers=workers) as pool:
        for start in range(first, limit, batch_size):
            idxs = order[start:start + batch_size]
            if len(idxs) == 0:
                break
            items = list(pool.map(dataset.__getitem__, idxs))
            yield collate(items)


def prefetch_to_device(iterator, *, size: int = 2, sharding=None):
    """Stage ``size`` batches ahead on device. Numpy leaves are transferred
    (respecting ``sharding`` when given, for data-parallel feeds); non-array
    leaves pass through untouched."""

    def transfer(batch):
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and (np.issubdtype(v.dtype, np.number)
                                              or v.dtype == np.bool_):
                out[k] = jax.device_put(v, sharding) if sharding is not None else jax.device_put(v)
            else:
                out[k] = v
        return out

    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    err = []
    # set when the consumer abandons the generator (close/raise mid-epoch —
    # e.g. a serving loop error): the producer must not stay blocked on a
    # full queue forever, which would leak a thread + staged device buffers
    # per abandoned epoch in a long-lived process
    stop = threading.Event()

    def put_or_stop(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if not put_or_stop(transfer(batch)):
                    return
        except Exception as e:  # surface loader errors in the consumer
            err.append(e)
        finally:
            put_or_stop(sentinel)

    t = threading.Thread(target=producer, daemon=True,
                         name="nextgen-uia-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()


def to_model_input(images_u8: np.ndarray, in_channels: int = 3):
    """[B, H, W] uint8 -> [B, H, W, C] float32 in [0,1] (ToTensor + optional
    1->3 channel repeat, classification.py:195-200)."""
    x = images_u8.astype(np.float32) / 255.0
    x = x[..., None]
    if in_channels == 3:
        x = np.repeat(x, 3, axis=-1)
    return x
