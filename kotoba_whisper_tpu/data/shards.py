"""Sharded, memory-mapped feature store for production-scale training.

The reference trains on `.vectorized` Hub datasets whose arrow files are
memory-mapped by `datasets` (run_distillation.py:520-532 loads a split,
shuffles by index, and streams batches without materializing the features
in RAM). The round-1 build's single `features.npz` per split loses that
property — `np.load` of a zipped npz decompresses the whole array, so a
1,253-hour split (~1M utterances x 0.9 MB of fp16 log-mel) cannot fit.

This module restores the bounded-memory contract the TPU input pipeline
needs (SURVEY.md §7.3 "input pipeline throughput"):

- Features are stored as raw `.npy` shards (`features_00000.npy`, ...,
  fp16, shape (n, n_mels, n_frames)) next to `filtered.jsonl` and a
  `shard_index.json`. `.npy` (unlike `.npz`) memory-maps, so random
  access during shuffled training touches only the pages a batch needs
  and the OS page cache — not the trainer — manages residency.
- `FeatureStore` exposes `gather(indices)` over the whole split; global
  indices are mapped to (shard, local) pairs and fetched shard-by-shard.
- Legacy single-`features.npz` dirs (round-1 layout, and the natural
  output of small test runs) load through the same interface.

Counterpart of the `datasets` arrow/mmap machinery the reference delegates
to (SURVEY.md §2.4 "datasets" row).
"""
from __future__ import annotations

import json
import os
from typing import Iterable, Iterator

import numpy as np

from kotoba_whisper_tpu.cli.common import read_jsonl, write_jsonl

INDEX_NAME = "shard_index.json"
ROWS_NAME = "filtered.jsonl"
LEGACY_NPZ = "features.npz"


def shard_path(dir_: str, k: int) -> str:
    return os.path.join(dir_, f"features_{k:05d}.npy")


class ShardWriter:
    """Streamingly write (row, feature) pairs into the sharded layout.

    Buffers at most `shard_size` utterances of features in RAM; rows
    (label jsonl records) are small and kept until close().
    """

    def __init__(self, out_dir: str, shard_size: int = 2048):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.shard_size = shard_size
        self.rows: list[dict] = []
        self._buf: list[np.ndarray] = []
        self._shard_sizes: list[int] = []
        self._feat_shape: tuple[int, ...] | None = None

    def add(self, row: dict, feature: np.ndarray | None) -> None:
        self.rows.append(row)
        if feature is not None:
            if self._feat_shape is None:
                self._feat_shape = tuple(feature.shape)
            self._buf.append(np.asarray(feature, np.float16))
            if len(self._buf) >= self.shard_size:
                self._flush()

    def add_batch(self, rows: Iterable[dict], features: np.ndarray | None) -> None:
        rows = list(rows)
        if features is None:
            self.rows.extend(rows)
            return
        assert len(rows) == features.shape[0]
        for r, f in zip(rows, features):
            self.add(r, f)

    def _flush(self) -> None:
        if not self._buf:
            return
        k = len(self._shard_sizes)
        arr = np.stack(self._buf).astype(np.float16)
        np.save(shard_path(self.out_dir, k), arr)
        self._shard_sizes.append(arr.shape[0])
        self._buf = []

    def close(self) -> dict:
        self._flush()
        write_jsonl(os.path.join(self.out_dir, ROWS_NAME), iter(self.rows))
        index = {
            "shard_sizes": self._shard_sizes,
            "n_rows": len(self.rows),
            "feature_shape": list(self._feat_shape) if self._feat_shape else None,
            "dtype": "float16",
        }
        if self._shard_sizes:
            with open(os.path.join(self.out_dir, INDEX_NAME), "w") as f:
                json.dump(index, f)
        return index


class FeatureStore:
    """Random-access view over one split dir (sharded or legacy layout)."""

    def __init__(self, dir_: str):
        self.dir = dir_
        self.rows = read_jsonl(os.path.join(dir_, ROWS_NAME))
        index_path = os.path.join(dir_, INDEX_NAME)
        npz_path = os.path.join(dir_, LEGACY_NPZ)
        self._mmaps: dict[int, np.ndarray] = {}
        if os.path.exists(index_path):
            with open(index_path) as f:
                self.index = json.load(f)
            sizes = np.asarray(self.index["shard_sizes"], np.int64)
            self._offsets = np.concatenate([[0], np.cumsum(sizes)])
            self._legacy = None
            assert self._offsets[-1] == len(self.rows), (
                f"{dir_}: {self._offsets[-1]} features != {len(self.rows)} rows"
            )
        elif os.path.exists(npz_path):
            # round-1 layout: one zipped array; small splits/tests only
            self._legacy = np.load(npz_path)["input_features"]
            self._offsets = None
            assert self._legacy.shape[0] == len(self.rows)
        else:
            self._legacy = None
            self._offsets = None  # labels-only dir (skip_logmel mode)

    def __len__(self) -> int:
        return len(self.rows)

    @property
    def has_features(self) -> bool:
        return self._legacy is not None or self._offsets is not None

    def _shard(self, k: int) -> np.ndarray:
        m = self._mmaps.get(k)
        if m is None:
            m = np.load(shard_path(self.dir, k), mmap_mode="r")
            self._mmaps[k] = m
        return m

    def gather(self, indices: np.ndarray) -> np.ndarray:
        """Fetch features for global indices (any order), fp16 (n, ...)."""
        indices = np.asarray(indices, np.int64)
        if self._legacy is not None:
            return self._legacy[indices]
        assert self._offsets is not None, f"{self.dir} has no features"
        shard_ids = np.searchsorted(self._offsets, indices, side="right") - 1
        out = None
        for k in np.unique(shard_ids):
            sel = shard_ids == k
            local = indices[sel] - self._offsets[k]
            vals = self._shard(int(k))[local]
            if out is None:
                out = np.empty((len(indices),) + vals.shape[1:], vals.dtype)
            out[sel] = vals
        assert out is not None
        return out

    def warm(self) -> None:
        """Sequentially touch every shard (next-split prefetch: pulls the
        files into the OS page cache while the previous split trains —
        the local-FS equivalent of the reference's next-split Hub download
        overlap, script/distil_whisper_v2.0.sh:182-202)."""
        if self._offsets is None:
            return
        for k in range(len(self.index["shard_sizes"])):
            # reading one element per 4096-byte page faults the whole file in
            arr = self._shard(k)
            np.asarray(arr[:: max(1, len(arr) // 64)]).sum()


def convert_npz_dir(src_dir: str, writer: ShardWriter) -> int:
    """Stream one legacy chunk dir (filtered.jsonl + features.npz) into a
    ShardWriter. Loads one chunk's features at a time (bounded RSS)."""
    rows = read_jsonl(os.path.join(src_dir, ROWS_NAME))
    npz_path = os.path.join(src_dir, LEGACY_NPZ)
    feats = None
    if os.path.exists(npz_path):
        feats = np.load(npz_path)["input_features"]
        assert feats.shape[0] == len(rows)
    writer.add_batch(rows, feats)
    return len(rows)


def resolve_split_dirs(spec: str) -> list[str]:
    """Resolve a --train_splits argument: a comma list of dirs, or a root
    dir containing split_* subdirs (data/merge.py output), or one dir."""
    if "," in spec:
        return [s for s in (p.strip() for p in spec.split(",")) if s]
    if os.path.isdir(spec):
        subs = sorted(
            (d for d in os.listdir(spec) if d.startswith("split_")),
            key=lambda d: int(d.split("_")[1]),
        )
        if subs:
            return [os.path.join(spec, d) for d in subs]
    return [spec]


def iter_split_batches(
    store: FeatureStore,
    order: np.ndarray,
    batch: int,
) -> Iterator[tuple[list[dict], np.ndarray]]:
    """Yield (rows, features) batches following `order`, dropping the tail
    remainder (lockstep static batch shapes — XLA needs them)."""
    for lo in range(0, len(order) - batch + 1, batch):
        idx = order[lo : lo + batch]
        yield [store.rows[i] for i in idx], store.gather(idx)
