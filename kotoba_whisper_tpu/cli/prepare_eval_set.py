"""Convert an eval dataset (any layout data/eval_sets.py understands —
HF saved-to-disk, jsonl manifest, tar+tsv) into the framework's canonical
tar+tsv layout, writing 16 kHz WAV members.

The reference pulls its ja_asr suites (common_voice_8_0, jsut_basic5000,
reazonspeech_test) from the Hub at eval time; this tool materializes such
sets once into the local layout every stage consumes.

Usage:
  python -m kotoba_whisper_tpu.cli.prepare_eval_set \
      --input /data/hf/reazonspeech_test --output_dir /data/reazonspeech_test
"""
from __future__ import annotations

import argparse
import struct


def _wav_bytes(audio, sr=16000) -> bytes:
    import numpy as np

    pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
    return (
        struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, 1,
            sr, sr * 2, 2, 16, b"data", len(pcm),
        )
        + pcm
    )


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--shard_size", type=int, default=512,
                    help="utterances per tar shard")
    ap.add_argument("--limit", type=int, default=None)
    arg = ap.parse_args(argv)

    import os

    from kotoba_whisper_tpu.data.eval_sets import iter_eval_set
    from kotoba_whisper_tpu.data.reazon import write_tar_shard

    os.makedirs(arg.output_dir, exist_ok=True)
    tsv_rows: list[str] = []
    shard: list[tuple[str, bytes]] = []
    shard_idx = 0
    n = 0

    def flush():
        nonlocal shard, shard_idx
        if shard:
            write_tar_shard(
                os.path.join(arg.output_dir, f"{shard_idx:03x}.tar"), shard
            )
            shard_idx += 1
            shard = []

    for ex in iter_eval_set(arg.input, limit=arg.limit):
        name = f"{shard_idx:03x}/utt{n}.wav"
        shard.append((name, _wav_bytes(ex.audio)))
        text = ex.text.replace("\t", " ").replace("\n", " ")
        tsv_rows.append(f"{name}\t{text}")
        n += 1
        if len(shard) >= arg.shard_size:
            flush()
    flush()

    with open(os.path.join(arg.output_dir, "transcript.tsv"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(tsv_rows) + ("\n" if tsv_rows else ""))
    print(f"wrote {n} utterances in {shard_idx} shard(s) -> {arg.output_dir}")


if __name__ == "__main__":
    main()
