"""Generate the committed tiny-model eval goldens (VERDICT r2 #6).

The reference ships committed prediction CSVs + metric JSONLs
(/root/reference/eval_pipeline) so eval regressions are diffable without
re-running models. Real weights are unavailable offline, so the repo's
goldens pin a fully deterministic stand-in: the seeded `preset:test-byte`
random model over a seeded synthetic tar/TSV eval set, evaluated through
the production eval driver (cli/eval_short_form) in float32 on CPU.

Regenerate (only when the decode/eval semantics intentionally change):
  python tools/make_eval_goldens.py
Regression test: tests/test_eval_goldens.py re-runs the same eval into a
tmp dir and requires cli/eval_diff --strict to pass against the
committed artifacts in tests/goldens/eval_pipeline.
"""
from __future__ import annotations

import os
import struct
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "goldens", "eval_pipeline")
DATASET_NAME = "golden_synth"
MODEL = "preset:test-byte"


def _wav_bytes(audio, sr=16000):
    pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
    return (
        struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, 1,
            sr, sr * 2, 2, 16, b"data", len(pcm),
        )
        + pcm
    )


def make_dataset(dataset_dir: str, n: int = 4) -> str:
    """Deterministic synthetic eval set: seeded tones+noise, fixed texts."""
    from kotoba_whisper_tpu.data import reazon

    os.makedirs(dataset_dir, exist_ok=True)
    rng = np.random.default_rng(1234)
    utts = []
    lines = []
    for i in range(n):
        t = np.arange(12000) / 16000.0
        audio = 0.2 * np.sin(2 * np.pi * (180 + 60 * i) * t)
        audio = audio + 0.02 * rng.standard_normal(t.shape)
        utts.append((f"g/{i}.wav", _wav_bytes(audio.astype(np.float32))))
        lines.append(f"g/{i}.wav\tgolden utterance number {i}")
    reazon.write_tar_shard(os.path.join(dataset_dir, "000.tar"), utts)
    with open(
        os.path.join(dataset_dir, "transcript.tsv"), "w", encoding="utf-8"
    ) as f:
        f.write("\n".join(lines))
    return dataset_dir


def run_eval(dataset_dir: str, output_dir: str) -> None:
    from kotoba_whisper_tpu.cli import eval_short_form

    eval_short_form.main([
        "--model", MODEL,
        "--tokenizer", "byte",
        "--dataset_dir", dataset_dir,
        "--dataset_name", DATASET_NAME,
        "--output_dir", output_dir,
        "--dtype", "float32",
    ])


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")  # goldens are CPU artifacts
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ds = make_dataset(os.path.join(td, "ds"))
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for f in os.listdir(GOLDEN_DIR):
            os.unlink(os.path.join(GOLDEN_DIR, f))
        run_eval(ds, GOLDEN_DIR)
    print("goldens written to", GOLDEN_DIR)
    for f in sorted(os.listdir(GOLDEN_DIR)):
        print(" ", f)


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
