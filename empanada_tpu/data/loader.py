"""Multi-threaded prefetching batch loader (torch-DataLoader replacement).

The reference feeds training with torch DataLoader worker processes
(scripts/train.py:264-276). Here augmentation + target creation are
numpy/cv2 (GIL-releasing) so a thread pool suffices: worker threads build
examples, a collator stacks them into pinned numpy batches, and the train
step moves them to device with the batch sharding. A one-batch prefetch
queue overlaps host data work with device compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

__all__ = ["DataLoader", "collate"]


def collate(examples, pad_to_max=False):
    """Stack a list of example dicts into a dict of batched numpy arrays.
    Non-array fields (e.g. fname) collect into lists."""
    out = {}
    for key in examples[0]:
        vals = [ex[key] for ex in examples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


class DataLoader:
    def __init__(self, dataset, batch_size=1, sampler=None, shuffle=False,
                 drop_last=False, num_workers=4, prefetch=2, seed=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch
        if self.sampler is not None and hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)

    def _indices(self):
        if self.sampler is not None:
            return list(iter(self.sampler))
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(idx)
        return idx.tolist()

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None \
            else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        indices = self._indices()
        batches = [
            indices[i:i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        if not batches:
            return

        out_q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                # pipeline: submit example fetches batch by batch
                for batch_idx in batches:
                    if stop.is_set():
                        break
                    examples = list(pool.map(
                        self.dataset.__getitem__, batch_idx))
                    out_q.put(collate(examples))
            out_q.put(None)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while producer.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    producer.join(timeout=0.1)
