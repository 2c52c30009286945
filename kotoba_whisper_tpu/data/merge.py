"""Per-chunk dataset merger.

Counterpart of misc/merge_reazon_all_dataset.py: concatenates the per-chunk
stage outputs (filtered.jsonl + features.npz) into `split_N` groups of
`chunks_per_split` chunks each (:11-79 — the reference groups 82 chunks
into splits of 10). Local-file equivalent of the Hub-config merge.
"""
from __future__ import annotations

import os

import numpy as np

from kotoba_whisper_tpu.cli.common import read_jsonl, write_jsonl


def merge_chunks(
    chunk_dirs: list[str],
    output_dir: str,
    chunks_per_split: int = 10,
) -> list[str]:
    """Each chunk dir holds filtered.jsonl (+ features.npz). Returns the
    split dirs written."""
    splits = []
    for s, lo in enumerate(range(0, len(chunk_dirs), chunks_per_split)):
        group = chunk_dirs[lo : lo + chunks_per_split]
        split_dir = os.path.join(output_dir, f"split_{s}")
        os.makedirs(split_dir, exist_ok=True)

        rows = []
        feats = []
        for d in group:
            rows.extend(read_jsonl(os.path.join(d, "filtered.jsonl")))
            fpath = os.path.join(d, "features.npz")
            if os.path.exists(fpath):
                feats.append(np.load(fpath)["input_features"])
        write_jsonl(os.path.join(split_dir, "filtered.jsonl"), iter(rows))
        if feats:
            np.savez(
                os.path.join(split_dir, "features.npz"),
                input_features=np.concatenate(feats, axis=0),
            )
        splits.append(split_dir)
    return splits


def chunk_status(work_dir: str, n_chunks: int) -> dict[str, list[int]]:
    """Chunk-completion audit (misc/preprocess_status_log.py equivalent):
    which chunk indices have finished the filter stage."""
    done, missing = [], []
    for i in range(n_chunks):
        path = os.path.join(work_dir, f"chunk_{i}", "filtered", "filtered.jsonl")
        (done if os.path.exists(path) else missing).append(i)
    return {"done": done, "missing": missing}
