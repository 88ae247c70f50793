"""Host-side batching dataloader with background prefetch.

Role of tools/builder.py:15-32 (DataLoader + DistributedSampler) — but much
thinner, because augmentation/corruption moved on-device: the loader only
shuffles indices, stacks numpy arrays, and prefetches a couple of batches on
a worker thread. Per-host sharding for multi-host SPMD hands each host a
contiguous slice of every global batch (the NamedSharding on the batch
axis does the device placement); drop_last=False pads the tail global
batch by wrapping, like torch's DistributedSampler.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import numpy as np


def _collate(samples) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    keys = samples[0].keys()
    for k in keys:
        v0 = samples[0][k]
        if isinstance(v0, np.ndarray):
            out[k] = np.stack([s[k] for s in samples])
        elif isinstance(v0, (int, np.integer)):
            out[k] = np.asarray([s[k] for s in samples], np.int32)
        else:
            out[k] = np.asarray([s[k] for s in samples])
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 num_hosts: int = 1, host_id: int = 0,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reshuffle per epoch (DistributedSampler.set_epoch role)."""
        self.epoch = epoch

    def __len__(self):
        if self.num_hosts == 1:
            n = len(self.dataset)
            if self.drop_last:
                return n // self.batch_size
            return (n + self.batch_size - 1) // self.batch_size
        # multi-host: every host sees the same number of GLOBAL batches
        # (anything else deadlocks the SPMD collectives on the short host)
        gb = self.batch_size * self.num_hosts
        if self.drop_last:
            return len(self.dataset) // gb
        return (len(self.dataset) + gb - 1) // gb

    def _indices(self) -> np.ndarray:
        """Per-host index stream (DistributedSampler role). Hosts take
        CONTIGUOUS slices of each global batch (host h owns
        global_batch[h*B : (h+1)*B]) rather than striding the dataset, so
        the global batch ``make_array_from_process_local_data`` assembles
        (process slices in process order) is BITWISE the single-process
        batch — per-sample corruption keys land on the same samples and a
        k-host run reproduces the 1-host loss exactly
        (tests/test_multihost.py)."""
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 9973 + self.epoch)
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        if self.num_hosts == 1:
            return idx
        gb = self.batch_size * self.num_hosts          # global batch
        if self.drop_last:
            nb = len(idx) // gb
        else:
            # pad the tail global batch by wrapping (DistributedSampler
            # drop_last=False semantics, torch sampler total_size logic):
            # every host must contribute a FULL local batch to every global
            # step or the mesh collectives deadlock on the short host
            nb = (len(idx) + gb - 1) // gb
            pad = nb * gb - len(idx)
            if pad > 0 and len(idx) > 0:
                reps = (pad + len(idx) - 1) // len(idx)
                idx = np.concatenate([idx, np.tile(idx, reps)[:pad]])
        out = [idx[g * gb + self.host_id * self.batch_size:
                   g * gb + (self.host_id + 1) * self.batch_size]
               for g in range(nb)]
        return np.concatenate(out) if out else idx[:0]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._indices()
        nb = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        # datasets exposing load_batch (e.g. ShapeNet's native threaded .npy
        # reader) hand the whole index slice to C++ instead of per-item python
        fast = getattr(self.dataset, "load_batch", None)

        def put(item) -> bool:
            """Bounded put that keeps checking the stop flag, so a consumer
            abandoning the iterator mid-epoch never leaves the worker (and
            its prefetched batch) blocked on a full queue forever."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in range(nb):
                    if stop.is_set():
                        return
                    sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
                    if fast is not None:
                        batch = fast([int(i) for i in sel])
                    else:
                        batch = _collate([self.dataset[int(i)] for i in sel])
                    if not put(batch):
                        return
                put(None)
            except BaseException as e:  # noqa: BLE001 - re-raised on consumer
                # without this, a dataset read error kills the thread before
                # the end sentinel and the consumer blocks in q.get() forever
                put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
