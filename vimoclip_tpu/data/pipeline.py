"""Host -> device input pipeline: deterministic batching, thread-pool item
loading, and double-buffered device prefetch.

The reference relies on torch DataLoader worker processes
(train.py:57, TFAM/train_and_eval.py:374-398). The TPU equivalent keeps item
loading on host threads (h5py/OpenCV release the GIL) and overlaps the
host->device copy of batch N+1 with the device step on batch N via
``prefetch_to_device`` — the double-buffering that DataParallel never needed
but pjit-on-TPU lives by (SURVEY.md §2.2 "decord" row).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator

import jax
import numpy as np


class BatchLoader:
    """Deterministic, epoch-seeded batch iterator over a map-style dataset.

    Matches torch DataLoader semantics the trainers depend on:
    ``shuffle`` per epoch, ``drop_last`` (reference uses drop_last=True for
    TFAM, train_and_eval.py:374,398), custom ``collate``.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate: Callable[[list], dict],
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        num_workers: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self._epoch = 0
        self._start_batch = 0

    def set_epoch(self, epoch: int, start_batch: int = 0) -> None:
        """Position the loader. ``start_batch`` skips the first N batches of
        this epoch's deterministic order WITHOUT loading them — mid-epoch
        resume lands exactly where the interrupted run stopped (same seed +
        epoch => same shuffle => same remaining batches)."""
        self._epoch = epoch
        self._start_batch = start_batch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self._epoch))
            rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[dict]:
        order = self._order()
        n_full = len(order) // self.batch_size
        end = n_full * self.batch_size if self.drop_last else len(order)
        batches = [
            order[i : i + self.batch_size] for i in range(0, end, self.batch_size)
        ]
        batches = batches[self._start_batch:]
        if self.num_workers <= 1:
            for b in batches:
                yield self.collate([self.dataset[int(i)] for i in b])
            return
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # pipeline item loading one batch ahead
            futures = [pool.map(self.dataset.__getitem__, [int(i) for i in b]) for b in batches[:2]]
            for k, b in enumerate(batches):
                items = list(futures[0])
                futures = futures[1:]
                nxt = k + 2
                if nxt < len(batches):
                    futures.append(
                        pool.map(self.dataset.__getitem__, [int(i) for i in batches[nxt]])
                    )
                yield self.collate(items)


def prefetch_to_device(
    iterator: Iterable[dict],
    size: int = 2,
    sharding=None,
    drop_keys: tuple[str, ...] = ("video_id",),
) -> Iterator[dict]:
    """Move batches onto device ``size`` steps ahead of consumption.

    Numpy leaves become device arrays (placed with ``sharding`` if given —
    e.g. ``batch_sharding(mesh)`` for a data-parallel mesh); non-array keys
    (video ids) pass through on host. ``sharding`` may also be a callable
    ``(key, value) -> Sharding | None`` for per-key placement (the TFAM
    trainer time-shards embeddings/masks over the ``seq`` axis so
    sequence-parallel steps start from the layout their shard_map wants
    instead of resharding on device).
    """
    import collections

    queue = collections.deque()
    per_key = callable(sharding)

    def _put(batch: dict) -> dict:
        out = {}
        for k, v in batch.items():
            if k in drop_keys or not isinstance(v, np.ndarray):
                out[k] = v
            else:
                s = sharding(k, v) if per_key else sharding
                out[k] = jax.device_put(v, s) if s is not None else jax.device_put(v)
        return out

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(_put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(_put(next(it)))
        except StopIteration:
            pass
        yield out
