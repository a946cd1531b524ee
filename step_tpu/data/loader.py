"""Batching data loader with background prefetch.

Reference parity: torch ``DataLoader(collate_fn=...)`` in ``train.py``
(recon). Host-side: worker threads decode/augment clips while the TPU runs
the previous step; `build_model_batch` pads everything to static shapes so
the compiled program never re-specializes.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from step_tpu.config import StepConfig
from step_tpu.data.pipeline import build_model_batch

_STACK_KEYS = ("rgb", "flow", "gt_tubes", "gt_labels", "gt_mask")


def collate(clips: list[dict]) -> dict:
    """Stack per-clip dicts into one raw batch (numeric keys only)."""
    out = {}
    for k in _STACK_KEYS:
        if k in clips[0]:
            out[k] = np.stack([c[k] for c in clips])
    out["meta"] = [
        {k: c[k] for k in c if k not in _STACK_KEYS} for c in clips
    ]
    return out


class DataLoader:
    """Iterate batches over a dataset with shuffling + threaded prefetch."""

    def __init__(
        self,
        dataset,
        cfg: StepConfig,
        batch_size: Optional[int] = None,
        shuffle: bool = True,
        train: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 4,
        drop_last: bool = True,
        process_count: int = 1,
        process_index: int = 0,
        emit_uint8: Optional[bool] = None,   # None -> cfg.uint8_transfer
    ):
        self.dataset = dataset
        self.cfg = cfg
        self.emit_uint8 = (cfg.uint8_transfer if emit_uint8 is None
                           else emit_uint8)
        self.batch_size = batch_size or cfg.batch_size
        self.shuffle = shuffle
        self.train = train
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.process_count = process_count
        self.process_index = process_index

    def __len__(self):
        n = self._num_local_examples() // self.batch_size
        if not self.drop_last and self._num_local_examples() % self.batch_size:
            n += 1
        return n

    def _num_local_examples(self) -> int:
        return len(self.dataset) // self.process_count

    def _epoch_order(self, epoch: int) -> np.ndarray:
        """Deterministic per-epoch order; multi-host, every process draws the
        SAME global shuffle (seeded) and takes its strided slice, truncated
        to equal length so per-host batch counts match (SPMD requirement)."""
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(idx)
        if self.process_count > 1:
            idx = idx[self.process_index::self.process_count]
            idx = idx[: self._num_local_examples()]
        return idx

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        """Yield model-ready batches for one epoch (prefetched)."""
        # datasets salt their augmentation RNG with this so every epoch
        # redraws fresh augmentations instead of replaying epoch 0's
        self.dataset._epoch = epoch
        order = self._epoch_order(epoch)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        # Clip decode/augment parallelizes across `num_workers` threads (cv2
        # releases the GIL in decode/resize); batch assembly stays ordered.
        pool = (
            ThreadPoolExecutor(self.num_workers) if self.num_workers > 1 else None
        )

        def load_clips(idxs):
            if pool is None:
                return [self.dataset[int(i)] for i in idxs]
            return list(pool.map(lambda i: self.dataset[int(i)], idxs))

        def put(item):
            """q.put that gives up when the consumer abandoned the epoch —
            a plain blocking put on the full prefetch queue would pin this
            thread (plus every prefetched batch) forever once the consumer
            breaks out early (max_batches, total_steps, preemption)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for bi, idxs in enumerate(batches):
                    if stop.is_set():
                        return
                    clips = load_clips(idxs)
                    raw = collate(clips)
                    batch = build_model_batch(
                        raw, self.cfg, train=self.train,
                        seed=self.seed + epoch * len(batches) + bi,
                        emit_uint8=self.emit_uint8,
                    )
                    batch["meta"] = raw["meta"]
                    if not put(batch):
                        return
            except BaseException as e:  # propagate to the consumer
                put(e)
            finally:
                put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
            if pool is not None:
                pool.shutdown(wait=False)

    def __iter__(self):
        return self.epoch(0)
