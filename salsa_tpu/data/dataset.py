"""Chunk dataset + host batching + background prefetch.

`SeldChunkDataset` slices fixed-length windows out of the concatenated split arrays
(reference dataset/dataloader.py:13-62); `batch_iterator` replaces the torch
DataLoader: shuffled fixed-size batches for training (incomplete tail dropped only if
requested), sequential one-clip batches for val/test so overlapping chunks of a clip
can be recombined downstream.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

from salsa_tpu.data.database import SplitData


class SeldChunkDataset:
    def __init__(self, data: SplitData, joint_transform=None, transform=None):
        self.data = data
        self.joint_transform = joint_transform
        self.transform = transform

    def __len__(self) -> int:
        return len(self.data)

    def fetch_raw(self, index: int):
        """Window materialization only (thread-safe; no rng-bearing transforms)."""
        d = self.data
        l0 = d.label_chunk_starts[index]
        x = d.get_feature_chunk(index)
        sed = d.sed_targets[l0 : l0 + d.label_chunk_len]
        doa = d.doa_targets[l0 : l0 + d.label_chunk_len]
        return x, sed, doa, d.clip_names[index]

    def apply_transforms(self, item):
        x, sed, doa, name = item
        if self.joint_transform is not None:
            x, sed, doa = self.joint_transform(x, sed, doa)
        if self.transform is not None:
            x = self.transform(x)
        return x, sed, doa, name

    def __getitem__(self, index: int):
        return self.apply_transforms(self.fetch_raw(index))


def batch_iterator(
    dataset: SeldChunkDataset,
    batch_size: int,
    shuffle: bool = False,
    drop_last: bool = False,
    rng: np.random.Generator | None = None,
    pad_to_batch: bool = False,
    process_shard: tuple[int, int] | None = None,
    num_workers: int = 0,
) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray, list[str], int]]:
    """Yields (x, sed, doa, clip_names, n_real) batches as stacked numpy arrays.

    With pad_to_batch, short tail batches are padded by repeating the last sample so
    jitted step functions see a single static batch shape; n_real reports the
    unpadded count.

    num_workers > 0 materializes each batch's chunk windows through a thread pool
    (useful with streaming LazySplitData, where every access is an HDF5 read);
    rng-bearing transforms still run serially in this thread, so augmentation
    draws stay deterministic for a given shuffle order.

    process_shard=(pid, n_proc) is the multi-host mode: the shuffle order is
    computed over the full dataset (so it is identical on every same-seeded
    process), but each process materializes only its own rows of each global
    batch — the host never reads chunks destined for another host's devices.
    Requires drop_last (uniform global batches).
    """
    order = np.arange(len(dataset))
    if shuffle:
        (rng or np.random.default_rng()).shuffle(order)
    pool = None
    if num_workers > 0:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(num_workers)
        materialize = lambda idx: [dataset.apply_transforms(it) for it in
                                   pool.map(dataset.fetch_raw, [int(j) for j in idx])]
    else:
        materialize = lambda idx: [dataset[int(j)] for j in idx]
    try:
        if process_shard is not None:
            pid, n_proc = process_shard
            assert drop_last and batch_size % n_proc == 0, (
                "multi-host batches must be uniform and divisible by process count")
            per = batch_size // n_proc
            for i in range(0, len(order) - batch_size + 1, batch_size):
                idx = order[i + pid * per : i + (pid + 1) * per]
                samples = materialize(idx)
                yield (np.stack([s[0] for s in samples]),
                       np.stack([s[1] for s in samples]),
                       np.stack([s[2] for s in samples]),
                       [s[3] for s in samples], per)
            return
        for i in range(0, len(order), batch_size):
            idx = order[i : i + batch_size]
            if len(idx) < batch_size:
                if drop_last:
                    return
                if pad_to_batch:
                    idx = np.concatenate(
                        [idx, np.repeat(idx[-1:], batch_size - len(idx))])
            samples = materialize(idx)
            n_real = min(batch_size, len(order) - i)
            x = np.stack([s[0] for s in samples])
            sed = np.stack([s[1] for s in samples])
            doa = np.stack([s[2] for s in samples])
            names = [s[3] for s in samples]
            yield x, sed, doa, names, n_real
    finally:
        # runs on exhaustion AND on generator close (early consumer break)
        if pool is not None:
            pool.shutdown(wait=False)


def prefetch(iterator, depth: int = 2):
    """Run `iterator` in a background thread, keeping up to `depth` batches ready.

    Host-side chunk slicing + augmentation overlaps with device compute (the single
    dispatch thread is otherwise serialized with the train step). Exceptions from
    the producer are re-raised at the consumer. Closing this generator early (the
    trainer breaks at steps_per_epoch under train_fraction) signals the producer
    to stop and close the inner iterator — no leaked threads, worker pools, or
    open file handles."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in iterator:
                if not put(item):
                    break
            put(_END)
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            put(e)
        finally:
            if hasattr(iterator, "close"):
                iterator.close()  # triggers batch_iterator's pool shutdown

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
