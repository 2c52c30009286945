"""Epochs x splits training schedule with deterministic resume + prefetch.

Reference behavior reproduced (the production v2.0 loop):
- `script/distil_whisper_v2.0.sh:182-202` trains 8 epochs x 9 `split_N`
  datasets, downloading split s+1 while split s trains. Here the schedule
  is driven in-process: one `FeatureStore` per split, with a daemon thread
  warming the next split's shards into the page cache, and a bounded queue
  overlapping host-side batch assembly (mmap gather + label collate input)
  with the device step.
- `run_distillation.py:697-727` resumes by re-shuffling per elapsed epoch
  and `skip_first_batches`. We improve on the stateful-RNG scheme: the
  shuffle for (epoch, split) is derived from `default_rng([seed, epoch,
  split])`, so the batch stream is a pure function of the position — a
  checkpoint needs only (epoch, split, batch) to resume bit-exactly, and
  resume stays correct even across restarts with different elapsed-epoch
  histories (the reference's replay is only correct if epoch count and
  dataset size never change).

Multi-host: each process takes the `order[process_index::process_count]`
slice of the shuffled order (the accelerate dataloader-sharding
equivalent, SURVEY.md §2.3 DP row) and feeds its local batch shard.
"""
from __future__ import annotations

import dataclasses
import json
import os
import queue
import threading
from typing import Iterator

import numpy as np

from kotoba_whisper_tpu.data.shards import FeatureStore

DATA_STATE_NAME = "data_state.json"


@dataclasses.dataclass(frozen=True)
class DataPosition:
    """Position of the NEXT batch to consume."""

    epoch: int = 0
    split: int = 0
    batch: int = 0

    def save(self, ckpt_dir: str) -> None:
        with open(os.path.join(ckpt_dir, DATA_STATE_NAME), "w") as f:
            json.dump(dataclasses.asdict(self), f)

    @staticmethod
    def load(ckpt_dir: str) -> "DataPosition | None":
        path = os.path.join(ckpt_dir, DATA_STATE_NAME)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return DataPosition(**json.load(f))


def split_order(
    seed: int, epoch: int, split: int, n: int,
    process_index: int = 0, process_count: int = 1,
) -> np.ndarray:
    """Deterministic shuffle for one (epoch, split), host-sliced."""
    rng = np.random.default_rng([seed, epoch, split])
    order = rng.permutation(n)
    if process_count > 1:
        order = order[process_index::process_count]
    return order


class ScheduleLoader:
    """Iterate epochs x splits from an arbitrary DataPosition."""

    def __init__(
        self,
        split_dirs: list[str],
        *,
        seed: int,
        global_batch: int,
        num_epochs: int,
        process_index: int = 0,
        process_count: int = 1,
        prefetch: bool = True,
    ):
        assert split_dirs
        assert global_batch % process_count == 0
        self.split_dirs = split_dirs
        self.seed = seed
        self.global_batch = global_batch
        self.local_batch = global_batch // process_count
        self.num_epochs = num_epochs
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self._stores: dict[int, FeatureStore] = {}
        self._sizes: dict[int, int] = {}
        self._lock = threading.Lock()

    def store(self, split: int) -> FeatureStore:
        with self._lock:
            s = self._stores.get(split)
            if s is None:
                s = FeatureStore(self.split_dirs[split])
                self._stores[split] = s
                # keep at most two splits open (current + prefetched next)
                for k in list(self._stores):
                    if k not in (split, split + 1):
                        self._stores.pop(k)
            return s

    def split_size(self, split: int) -> int:
        n = self._sizes.get(split)
        if n is None:
            n = len(self.store(split))
            self._sizes[split] = n
        return n

    def batches_in_split(self, split: int) -> int:
        n_local = len(
            split_order(0, 0, 0, self.split_size(split),
                        self.process_index, self.process_count)
        )
        return n_local // self.local_batch

    def steps_per_epoch(self) -> int:
        return sum(self.batches_in_split(s) for s in range(len(self.split_dirs)))

    def _warm_next(self, split: int) -> None:
        if split + 1 >= len(self.split_dirs):
            return
        t = threading.Thread(
            target=lambda: self.store(split + 1).warm(), daemon=True
        )
        t.start()

    def _split_batches(
        self, epoch: int, split: int, start_batch: int
    ) -> Iterator[tuple[DataPosition, list[dict], np.ndarray]]:
        store = self.store(split)
        order = split_order(
            self.seed, epoch, split, len(store),
            self.process_index, self.process_count,
        )
        n_batches = len(order) // self.local_batch

        def assemble(b: int):
            idx = order[b * self.local_batch : (b + 1) * self.local_batch]
            rows = [store.rows[i] for i in idx]
            feats = store.gather(idx) if store.has_features else None
            return DataPosition(epoch, split, b), rows, feats

        if not self.prefetch:
            for b in range(start_batch, n_batches):
                yield assemble(b)
            return

        q: queue.Queue = queue.Queue(maxsize=2)

        def producer():
            try:
                for b in range(start_batch, n_batches):
                    q.put(assemble(b))
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item

    def batches(
        self, start: DataPosition = DataPosition()
    ) -> Iterator[tuple[DataPosition, list[dict], np.ndarray]]:
        """Yield (position, rows, features) from `start` to the end of the
        schedule. `position` identifies the yielded batch; the position to
        persist for resume is `next_position(position)`."""
        n_splits = len(self.split_dirs)
        for epoch in range(start.epoch, self.num_epochs):
            split0 = start.split if epoch == start.epoch else 0
            for split in range(split0, n_splits):
                batch0 = (
                    start.batch
                    if (epoch, split) == (start.epoch, start.split)
                    else 0
                )
                if self.prefetch:
                    self._warm_next(split)
                yield from self._split_batches(epoch, split, batch0)

    def next_position(self, pos: DataPosition) -> DataPosition:
        """Position immediately after `pos` (normalized across split/epoch
        boundaries so it is always a valid `batches(start=...)` argument)."""
        b = pos.batch + 1
        if b < self.batches_in_split(pos.split):
            return DataPosition(pos.epoch, pos.split, b)
        if pos.split + 1 < len(self.split_dirs):
            return DataPosition(pos.epoch, pos.split + 1, 0)
        return DataPosition(pos.epoch + 1, 0, 0)
