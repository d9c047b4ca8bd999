"""Prefetching host->device input pipeline (SURVEY.md §2.6: the torch
DataLoader-workers + pin_memory role): a background thread assembles
batches (using the C++ batch decoder when the dataset is store-backed)
while the device computes, and batches are `jax.device_put` ahead of
consumption — a double-buffer that hides host latency behind TPU steps.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np


class Prefetcher:
    """Wrap a batch iterator; overlap host batch assembly (and optionally
    H2D transfer) with device compute.

    with Prefetcher(dataset.batches(64), buffer_size=2) as it:
        for batch in it:
            state, _ = train_step(state, batch, ...)

    Handoff modes (BASELINE.md round-3 measurement):
      * default (no device/sharding/place): batches are handed off as
        NUMPY — only host assembly overlaps; the jitted consumer performs
        the transfer as part of dispatch. On the TPU-via-tunnel runtime
        an eager background `jax.device_put` per array SERIALIZES on
        tunnel round-trips and measured 1.5-3x SLOWER per step than the
        synchronous path, while numpy handoff is neutral-to-positive —
        so eager transfer is opt-in, not the default.
      * `device=...` / `sharding=...`: worker thread device_puts to the
        given placement (REQUIRED for the data-parallel mesh path, where
        the batch must land sharded on the `data` axis).
      * `place=fn`: custom placement (multi-host global-array assembly).
    """

    _DONE = object()

    def __init__(self, batches: Iterator[dict], buffer_size: int = 2,
                 device=None, sharding=None, host_keys=(), place=None):
        self.batches = batches
        self.device = device
        self.sharding = sharding
        self.host_keys = frozenset(host_keys)  # stay numpy (host-side use)
        # `place(value) -> on-device value` overrides the default
        # device_put (e.g. multi-host global-array assembly)
        self.place = place
        self.q: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._started = False

    def _put(self, batch):
        if self.place is not None:
            put = self.place
        else:
            target = self.sharding or self.device
            # numpy handoff when no placement requested — see class
            # docstring for the measured rationale
            put = (lambda v: jax.device_put(v, target)) \
                if target is not None else (lambda v: v)
        self.q.put({k: v if k in self.host_keys else put(v)
                    for k, v in batch.items()})

    def _worker(self):
        try:
            for batch in self.batches:
                self._put({k: v for k, v in batch.items()
                           if isinstance(v, (np.ndarray, jax.Array))})
        except BaseException as e:  # propagate into the consumer
            self._err = e
        finally:
            self.q.put(self._DONE)

    def __enter__(self):
        self._thread.start()
        self._started = True
        return self

    def __exit__(self, *exc):
        if self._started:
            # drain so the worker can exit
            while True:
                try:
                    if self.q.get_nowait() is self._DONE:
                        break
                except queue.Empty:
                    if not self._thread.is_alive():
                        break
            self._thread.join(timeout=5)

    def __iter__(self):
        if not self._started:
            self.__enter__()
        while True:
            item = self.q.get()
            if item is self._DONE:
                if self._err is not None:
                    raise self._err
                return
            yield item


def place_batches(batches: Iterator[dict], device=None, sharding=None,
                  host_keys=(), place=None):
    """Synchronous counterpart of Prefetcher's placement (`--prefetch 0`
    paths): apply the same device/sharding/place handoff per batch with
    no background thread. With no placement requested, batches pass
    through as numpy. Keeping this in lockstep with Prefetcher._put means
    a data-parallel mesh gets its sharded H2D transfer whether or not
    prefetching is enabled."""
    host_keys = frozenset(host_keys)
    if place is None:
        target = sharding or device
        place = (lambda v: jax.device_put(v, target)) \
            if target is not None else (lambda v: v)
    for batch in batches:
        # same array filter as Prefetcher._worker: non-array values
        # (e.g. aux_info) never reach device_put
        yield {k: v if k in host_keys else place(v)
               for k, v in batch.items()
               if isinstance(v, (np.ndarray, jax.Array))}


def store_batches(store, field_names, batch_size: int, labels_fn=None,
                  shuffle: bool = True, seed: int = 0,
                  n_threads: int = 0):
    """Batch iterator straight off a GestureStore using the native batch
    decoder (data/native codec) — the fastest host path for fixed-shape
    fields. `labels_fn(record) -> array` covers derived fields (e.g.
    one-hot emotion labels from aux_info)."""
    order = np.arange(len(store))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    end = len(store) - len(store) % batch_size
    for i in range(0, end, batch_size):
        idx = order[i : i + batch_size].astype(np.int64)
        batch = {name: store.batch_field(idx, name, n_threads)
                 for name in field_names}
        if labels_fn is not None:
            batch["eid_label"] = np.stack(
                [labels_fn(store[int(j)]) for j in idx])
        yield batch
