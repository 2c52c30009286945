"""Shared CLI plumbing: model/tokenizer loading and the local dataset
interchange formats.

Stage artifacts (the reference uses the HF Hub as its data bus,
SURVEY.md §1 L7; this framework uses local files, hub-agnostic):
  - pseudo labels: `pseudo_labels.jsonl` rows
      {"name", "transcription", "whisper_transcript": [token ids]}
    plus a CSV dump mirroring run_pseudo_labelling.py:347-350;
  - filtered training set: `filtered.jsonl` rows {"name", "labels": [ids]}
    and `features.npz` with input_features (N, n_mels, 3000) — the
    `.vectorized` equivalent (run_data_filtering.py:335-356).
"""
from __future__ import annotations

import json
import os
from typing import Any, Iterator

import numpy as np

from kotoba_whisper_tpu.core.config import PRESETS, WhisperConfig
from kotoba_whisper_tpu.tokenizer.whisper_tokenizer import WhisperTokenizer


def load_tokenizer(spec: str) -> WhisperTokenizer:
    """'byte' | 'byte:<vocab_size>' | path to dir with vocab.json+merges.txt.

    For vocab-file dirs the language count comes from the checkpoint's
    config.json vocab_size when present (51866 -> 100 langs, v3), falling
    back to a 'v3' marker in the path, else the 99-language v2 layout."""
    if spec == "byte":
        return WhisperTokenizer.byte_vocab()
    if spec.startswith("byte:"):
        return WhisperTokenizer.byte_vocab(int(spec.split(":", 1)[1]))
    n_langs = 100 if "v3" in spec else 99
    cfg_path = os.path.join(spec, "config.json")
    if os.path.isfile(cfg_path):
        with open(cfg_path) as f:
            vocab_size = json.load(f).get("vocab_size")
        if vocab_size == 51866:
            n_langs = 100
        elif vocab_size == 51865:
            n_langs = 99
    return WhisperTokenizer.from_pretrained_dir(spec, n_langs=n_langs)


def fuse_unless(params, disabled: bool):
    """Lossless inference projection fusion (models/optimized.py) unless
    disabled — fewer, larger matmuls in the decode hot loop."""
    if disabled:
        return params
    from kotoba_whisper_tpu.models.optimized import fuse_for_inference

    return fuse_for_inference(params)


def quantize_if(params, gemm_dtype: str):
    """Opt-in w8a8 int8 projections (models/quantized.py): 2x MXU rate on
    the encoder GEMMs, halved decoder weight streaming. Changes outputs —
    the operator validates pseudo-label quality (cli/parity_check.py)."""
    if gemm_dtype == "compute":
        return params
    if gemm_dtype != "int8":
        raise SystemExit(f"unsupported --gemm_dtype {gemm_dtype}")
    from kotoba_whisper_tpu.models.quantized import quantize_for_inference

    return quantize_for_inference(params)


def load_model(spec: str, seed: int = 0):
    """'preset:<name>' (random init) or a checkpoint dir (HF layout)."""
    import jax

    from kotoba_whisper_tpu.models import whisper

    if spec.startswith("preset:"):
        cfg = PRESETS[spec.split(":", 1)[1]]
        return whisper.init_params(jax.random.key(seed), cfg), cfg
    from kotoba_whisper_tpu.train.checkpoint import import_hf_model

    return import_hf_model(spec)


def load_generation_defaults(model_spec: str) -> dict[str, Any]:
    """Decode defaults from a checkpoint dir's generation_config.json
    (HF layout): suppress lists and the initial-timestamp cap. Presets and
    dirs without the file get empty suppress lists."""
    defaults: dict[str, Any] = {
        "suppress_tokens": (),
        "begin_suppress_tokens": (),
        "max_initial_timestamp_index": 50,
    }
    path = os.path.join(model_spec, "generation_config.json")
    if os.path.isfile(path):
        with open(path) as f:
            g = json.load(f)
        if g.get("suppress_tokens"):
            defaults["suppress_tokens"] = tuple(g["suppress_tokens"])
        if g.get("begin_suppress_tokens"):
            defaults["begin_suppress_tokens"] = tuple(g["begin_suppress_tokens"])
        if g.get("max_initial_timestamp_index") is not None:
            defaults["max_initial_timestamp_index"] = g[
                "max_initial_timestamp_index"
            ]
    return defaults


def add_distributed_flags(ap) -> None:
    """Multi-host process-group flags shared by the stage drivers — the
    `accelerate launch --multi_gpu` equivalent (SURVEY.md §5.8). Each
    process of a multi-host job runs the same driver command plus these
    three flags (or inherits a cluster env jax.distributed can read)."""
    ap.add_argument("--coordinator_address", default=None,
                    help="host:port of process 0 (jax.distributed "
                    "rendezvous); enables multi-process mode")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)


def init_distributed(arg) -> bool:
    """Join the process group BEFORE any jax device use (the platform pin
    is applied first so the coordination service binds the right
    backend). Returns True when running multi-process."""
    if getattr(arg, "coordinator_address", None) is None:
        return False
    from kotoba_whisper_tpu.parallel import multihost
    from kotoba_whisper_tpu.utils.backend import apply_platform_pin

    apply_platform_pin()
    multihost.initialize(
        coordinator_address=arg.coordinator_address,
        num_processes=arg.num_processes,
        process_id=arg.process_id,
    )
    import jax

    return jax.process_count() > 1


def write_jsonl(path: str, rows: Iterator[dict[str, Any]]) -> int:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    n = 0
    with open(path, "w") as f:
        for row in rows:
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
            n += 1
    return n


def read_jsonl(path: str) -> list[dict[str, Any]]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def batched(seq, n):
    batch = []
    for item in seq:
        batch.append(item)
        if len(batch) == n:
            yield batch
            batch = []
    if batch:
        yield batch


def pad_batch(rows: list[np.ndarray], batch_size: int) -> tuple[np.ndarray, int]:
    """Pad a final partial batch by repeating the last row (static shapes
    for jit); returns (array, n_real)."""
    n_real = len(rows)
    while len(rows) < batch_size:
        rows.append(rows[-1])
    return np.stack(rows), n_real
