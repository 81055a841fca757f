"""Training input pipeline: host batching + background H2D prefetch.

The reference loads its one input binary synchronously before the compute
loop starts (Main.c's load-then-run; ViT_opencl.c enqueues all inputs up
front). That works for a 2-image demo; a training loop needs a pipeline
that keeps the accelerator fed: while the chip runs step N, the host must
already be shipping batch N+1. On this runtime every ``device_put`` is an
async dispatch, so a small background thread issuing transfers a couple of
batches ahead overlaps H2D with compute without any device-side machinery —
XLA's queue provides the ordering.

Pieces:

- :func:`memory_dataset` — epochs of shuffled host batches over in-memory
  arrays (the scale class the reference's ``input.bin`` format serves).
- :class:`DevicePrefetcher` — wraps any iterator of host batches and keeps
  ``buffer_size`` batches in flight on the device (or sharded over a mesh
  via a ``NamedSharding``).
- :func:`input_bin_dataset` — the reference wire format straight into the
  pipeline (io/binfmt.load_image_data → batches).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional, Sequence

import jax
import numpy as np

__all__ = [
    "memory_dataset",
    "input_bin_dataset",
    "DevicePrefetcher",
]


def memory_dataset(
    images: np.ndarray,
    labels: Optional[np.ndarray],
    batch_size: int,
    *,
    epochs: Optional[int] = 1,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
) -> Iterator[tuple]:
    """Yield ``(images, labels)`` host batches for ``epochs`` passes
    (``epochs=None`` → forever). Shuffles per epoch with a deterministic
    per-epoch seed so runs are reproducible and resumable by epoch index.
    """
    n = images.shape[0]
    if labels is not None and labels.shape[0] != n:
        raise ValueError(
            f"images ({n}) and labels ({labels.shape[0]}) length mismatch"
        )
    if batch_size < 1 or (drop_last and batch_size > n):
        raise ValueError(
            f"batch_size {batch_size} invalid for dataset of {n}"
        )
    epoch = 0
    while epochs is None or epoch < epochs:
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed + epoch).shuffle(order)
        stop = n - batch_size + 1 if drop_last else n
        for lo in range(0, max(stop, 0), batch_size):
            idx = order[lo:lo + batch_size]
            yield (
                images[idx],
                None if labels is None else labels[idx],
            )
        epoch += 1


def input_bin_dataset(path: str, batch_size: int, **kw) -> Iterator[tuple]:
    """Reference ``input.bin`` → unlabeled host batches (labels are None).

    The wire format is the reference's packed image binary
    (SURVEY §2.4 / Main.c's input loader); see io/binfmt.load_image_data.
    """
    from .io import binfmt

    images = binfmt.load_image_data(path)
    return memory_dataset(images, None, batch_size, **kw)


_STOP = object()


class DevicePrefetcher:
    """Iterate device-resident batches, keeping ``buffer_size`` in flight.

    A daemon thread pulls host batches from ``source``, issues the (async)
    ``device_put`` — to one device, or sharded via ``sharding`` (e.g.
    ``NamedSharding(mesh, P("data"))`` to split the batch over the mesh's
    data axis) — and parks the in-flight arrays in a bounded queue. The
    consumer pops arrays that are already transferring/transferred, so the
    host→device copy of batch N+1 overlaps the compute of batch N.

    Exceptions in the source propagate to the consumer at the point of
    ``next()``; ``close()`` (or garbage collection of an exhausted
    iterator) stops the thread.
    """

    def __init__(
        self,
        source: Iterable,
        *,
        buffer_size: int = 2,
        sharding=None,
        device=None,
    ):
        if buffer_size < 1:
            raise ValueError(f"buffer_size must be >= 1, got {buffer_size}")
        if sharding is not None and device is not None:
            raise ValueError("pass sharding or device, not both")
        self._target = sharding if sharding is not None else (
            device if device is not None else jax.devices()[0]
        )
        self._q: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, args=(iter(source),), daemon=True
        )
        self._thread.start()

    def _put_batch(self, batch):
        target = self._target
        return jax.tree.map(
            lambda a: a if a is None else jax.device_put(a, target),
            batch,
            is_leaf=lambda a: a is None,
        )

    def _put_or_stop(self, item) -> bool:
        """Bounded put that honors the stop flag (a blocking put on a full
        queue after the consumer stopped would leak this thread and pin
        buffer_size device batches in HBM forever)."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _run(self, it):
        try:
            for batch in it:
                if self._stop.is_set():
                    return
                if not self._put_or_stop(self._put_batch(batch)):
                    return
            self._put_or_stop(_STOP)
        except BaseException as e:  # noqa: BLE001 — relayed to consumer
            self._put_or_stop(e)

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            try:
                item = self._q.get(timeout=0.1)
                break
            except queue.Empty:
                if not self._thread.is_alive() and self._q.empty():
                    raise StopIteration
        if item is _STOP:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item

    def close(self):
        self._stop.set()

    def __del__(self):  # pragma: no cover — best-effort cleanup
        self._stop.set()
