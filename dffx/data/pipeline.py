"""Host-side input pipeline: threaded prefetch + device double-buffering.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=...,
pin_memory=True)`` (`train_code_DDFF.py:69-70`) with a thread-pool prefetcher
(the decoders — h5py, cv2, zlib — release the GIL) feeding ``jax.device_put``
with a lookahead queue so the TPU never waits on the host.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterable, Iterator, Optional, Sequence

import jax
import numpy as np


def _stack_batch(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    # "unpadded" (h, w) tuples stack to a (B, 2) int array — batched eval
    # needs them; the train CLI filters its batch keys anyway
    return {k: np.stack([np.asarray(s[k]) for s in samples], axis=0) for k in samples[0]}


class Loader:
    """Minimal epoch-based batched loader with threaded sample decoding."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        num_threads: int = 4,
        seed: int = 0,
        lookahead: int = 4,
        process_id: int = 0,
        process_count: int = 1,
    ):
        """``batch_size`` is the GLOBAL batch.  Under multi-host data
        parallelism each host constructs the identical shuffled order (same
        seed) and loads only its contiguous ``batch_size / process_count``
        slice of every batch — sample-index sharding, no cross-host IO."""
        if process_count > 1:
            assert batch_size % process_count == 0, (batch_size, process_count)
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.lookahead = lookahead
        self.process_id = process_id
        self.process_count = process_count
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        if self.process_count > 1:
            # multi-host: every batch must be full so the per-host slices line
            # up with the global sharding (partial trailing batches dropped)
            local = self.batch_size // self.process_count
            batches = [
                b[self.process_id * local : (self.process_id + 1) * local]
                for b in batches
                if len(b) == self.batch_size
            ]

        with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
            futs = queue.Queue()
            it = iter(batches)

            def submit_next():
                try:
                    idxs = next(it)
                except StopIteration:
                    return False
                futs.put(pool.submit(self._load_batch, idxs))
                return True

            for _ in range(self.lookahead):
                if not submit_next():
                    break
            while not futs.empty():
                fut = futs.get()
                submit_next()
                yield fut.result()

    def _load_batch(self, idxs) -> Dict[str, np.ndarray]:
        return _stack_batch([self.dataset[int(i)] for i in idxs])


def device_prefetch(
    iterator: Iterable,
    *,
    sharding: Optional[jax.sharding.Sharding] = None,
    size: int = 2,
    transform=None,
):
    """Move batches to device ahead of consumption (double buffering).

    ``transform`` overrides the per-item device placement — e.g. batched
    eval keeps the host batch alongside device-put inputs."""
    buf: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    error: list = []
    stop = threading.Event()  # set when the consumer abandons the generator

    def put(batch):
        if transform is not None:
            return transform(batch)
        if sharding is not None:
            from dffx.parallel.distributed import global_batch

            # single-process: a plain device_put; multi-host: assemble the
            # global jax.Array from this host's local slice
            return global_batch(batch, sharding)
        return jax.tree_util.tree_map(jax.device_put, batch)

    def put_or_stop(item) -> bool:
        # a plain buf.put would block forever if the consumer broke out of
        # the generator early (e.g. --steps-per-epoch), pinning this thread
        # AND the Loader's ThreadPoolExecutor for the process lifetime
        while not stop.is_set():
            try:
                buf.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if not put_or_stop(put(batch)):
                    return
        except BaseException as e:  # surface decode/transfer errors, don't
            error.append(e)         # silently truncate the epoch
        finally:
            put_or_stop(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = buf.get()
            if item is sentinel:
                break
            yield item
    finally:
        stop.set()  # releases the producer (and the Loader's pool) on early exit
    if error:
        raise error[0]
