"""Stage-2 driver: teacher batch pseudo-labelling.

TPU-native counterpart of run_pseudo_labelling.py (call stack SURVEY.md
§3.1): streams utterances from tar shards, decodes audio natively, runs the
log-mel frontend ON DEVICE (the reference burns CPU workers on this — hot
loop #1), and batch-generates token-id pseudo-labels with timestamps via
greedy or beam decode. Outputs pseudo_labels.jsonl (+ CSV dump mirroring
the reference's run_pseudo_labelling.py:347-350).

Usage:
  python -m kotoba_whisper_tpu.cli.pseudo_label \
      --dataset_dir /data/reazon --output_dir out/ \
      --model preset:test-tiny --tokenizer byte \
      --language ja --task transcribe --batch_size 8 --num_beams 1
"""
from __future__ import annotations

import argparse
import csv
import os
import time

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--model", default="preset:large-v3")
    ap.add_argument("--tokenizer", default="byte")
    ap.add_argument("--language", default="ja")
    ap.add_argument("--task", default="transcribe",
                    choices=["transcribe", "translate"])
    ap.add_argument(
        "--text_lang_task", default=None,
        help="v3 bilingual mode: comma list of lang:task pairs, e.g. "
        "'ja:transcribe,en:translate' — each generated separately per "
        "batch into whisper_transcript/{task}.{lang} columns "
        "(run_pseudo_labelling_v3.py:312-321 semantics)",
    )
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--num_beams", type=int, default=1)
    ap.add_argument("--max_label_length", type=int, default=128)
    ap.add_argument("--return_timestamps", action="store_true", default=True)
    ap.add_argument("--no_timestamps", dest="return_timestamps",
                    action="store_false")
    ap.add_argument("--chunk_lo", type=int, default=None,
                    help="shard range start (idempotent-chunk recipe)")
    ap.add_argument("--chunk_hi", type=int, default=None)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--kv_dtype", default="compute", choices=["compute", "int8", "int4"],
                    help="int8: per-row-quantized KV caches (halves decode "
                    "HBM traffic); int4: per-head-quantized cross-KV "
                    "(halves it again; similar logit perturbation)")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--no_fuse", action="store_true",
                    help="skip the lossless inference projection fusion")
    arg = ap.parse_args(argv)

    import jax

    from kotoba_whisper_tpu.utils.backend import ensure_backend

    ensure_backend()
    import jax.numpy as jnp

    from kotoba_whisper_tpu.cli import common
    from kotoba_whisper_tpu.core.config import FeatureConfig
    from kotoba_whisper_tpu.data import reazon
    from kotoba_whisper_tpu.data.collator import CollatorConfig, collate_audio
    from kotoba_whisper_tpu.decode.beam import generate_beam
    from kotoba_whisper_tpu.decode.greedy import GenerateOptions, generate_greedy
    from kotoba_whisper_tpu.ops.mel import log_mel_spectrogram
    from kotoba_whisper_tpu.train.logging import Throughput
    from kotoba_whisper_tpu.utils import native

    tok = common.load_tokenizer(arg.tokenizer)
    params, cfg = common.load_model(arg.model)
    compute_dtype = jnp.bfloat16 if arg.dtype == "bfloat16" else jnp.float32
    params = jax.tree.map(lambda x: x.astype(compute_dtype), params)
    params = common.fuse_unless(params, arg.no_fuse)
    attn_impl = "pallas" if jax.default_backend() == "tpu" else "xla"

    feat = FeatureConfig(n_mels=cfg.num_mel_bins)
    ccfg = CollatorConfig(n_samples=feat.n_samples)

    # v1 mode: one (language, task); v3 bilingual: several, each decoded
    # per batch with its own forced prefix
    if arg.text_lang_task:
        pairs = [p.split(":") for p in arg.text_lang_task.split(",")]
        lang_tasks = [(lang, task) for lang, task in pairs]
    else:
        lang_tasks = [(arg.language, arg.task)]

    gen_defaults = common.load_generation_defaults(arg.model)
    task_opts = {
        f"{task}.{lang}": GenerateOptions(
            prompt_ids=tuple(
                tok.sot_sequence(lang, task, timestamps=arg.return_timestamps)
            ),
            max_length=arg.max_label_length,
            return_timestamps=arg.return_timestamps,
            **gen_defaults,
        )
        for lang, task in lang_tasks
    }

    def generate(batch_audio: np.ndarray) -> dict[str, np.ndarray]:
        mel = log_mel_spectrogram(jnp.asarray(batch_audio), feat).astype(
            compute_dtype
        )
        out = {}
        for key, opts in task_opts.items():
            if arg.num_beams > 1:
                toks, _ = generate_beam(
                    params, cfg, mel, opts, tok.special,
                    num_beams=arg.num_beams, compute_dtype=compute_dtype,
                    attn_impl=attn_impl, kv_dtype=arg.kv_dtype,
                )
            else:
                toks = generate_greedy(
                    params, cfg, mel, opts, tok.special,
                    compute_dtype=compute_dtype, attn_impl=attn_impl,
                    kv_dtype=arg.kv_dtype,
                )
            out[key] = np.asarray(toks)
        return out

    chunk_range = (
        (arg.chunk_lo, arg.chunk_hi)
        if arg.chunk_lo is not None and arg.chunk_hi is not None
        else None
    )
    utts = reazon.iter_dataset_dir(arg.dataset_dir, chunk_range=chunk_range)

    os.makedirs(arg.output_dir, exist_ok=True)
    jsonl_path = os.path.join(arg.output_dir, "pseudo_labels.jsonl")
    csv_path = os.path.join(arg.output_dir, "pseudo_labels.csv")
    tp = Throughput(n_chips=jax.device_count())
    tp.start()
    n_done = 0

    from kotoba_whisper_tpu.parallel.multihost import interleave_prefetch

    def host_batches():
        """Audio decode + collation, prefetched on a background thread so
        host work overlaps device compute (the reference's chunk-N+1
        double-buffering, script/distil_whisper_v2.0.sh:72-84, done
        in-process)."""
        import sys

        for batch in common.batched(utts, arg.batch_size):
            good, audio = [], []
            for u in batch:
                try:
                    wav, _ = native.decode_audio(u.audio_bytes, feat.sampling_rate)
                except ValueError:
                    print(f"warning: skipping undecodable audio {u.name}",
                          file=sys.stderr)
                    continue
                good.append(u)
                audio.append(wav)
            if good:
                yield good, audio, collate_audio(audio, ccfg)

    def rows():
        nonlocal n_done
        with open(csv_path, "w", newline="") as cf:
            writer = csv.writer(cf)
            writer.writerow(["file_id", "whisper_transcript"])
            for batch, audio, arr in interleave_prefetch(host_batches()):
                if arg.limit is not None and n_done >= arg.limit:
                    break
                per_task = generate(arr)
                main_key = next(iter(task_opts))
                for bi, (u, wav) in enumerate(zip(batch, audio)):
                    record = {
                        "name": u.name,
                        "transcription": u.transcription,
                    }
                    for key, toks in per_task.items():
                        ids = toks[bi].tolist()
                        if tok.special.eot in ids:
                            ids = ids[: ids.index(tok.special.eot) + 1]
                        col = (
                            "whisper_transcript"
                            if not arg.text_lang_task
                            else f"whisper_transcript/{key}"
                        )
                        record[col] = ids
                        if key == main_key:
                            text = tok.decode(
                                ids, skip_special_tokens=False,
                                decode_with_timestamps=True,
                            )
                            writer.writerow([u.name, text])
                    tp.add(len(wav) / feat.sampling_rate)
                    n_done += 1
                    yield record

    n = common.write_jsonl(jsonl_path, rows())
    rate = tp.rate()
    print(
        f"pseudo-labelled {n} utterances -> {jsonl_path} "
        f"({rate:.1f} audio-s/s/chip)"
    )


if __name__ == "__main__":
    main()
