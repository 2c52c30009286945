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
    ap.add_argument("--wire_dtype", default="float32",
                    choices=["float32", "int16"],
                    help="int16: ship audio to the device as 16-bit PCM "
                    "and normalize on device (ops/mel.py) — halves the "
                    "per-batch upload, which dominates on remote-attached "
                    "chips. Near-lossless: quantizes to the 16-bit grid "
                    "(the source precision of PCM corpora); resampled or "
                    ">16-bit audio loses sub-LSB detail, so labels can "
                    "differ from the fp32 wire at bit level")
    ap.add_argument("--kv_dtype", default="compute", choices=["compute", "int8", "int4"],
                    help="int8: per-row-quantized KV caches (halves decode "
                    "HBM traffic); int4: per-head-quantized cross-KV "
                    "(halves it again; similar logit perturbation)")
    ap.add_argument("--gemm_dtype", default="compute",
                    choices=["compute", "int8"],
                    help="int8: w8a8 dense projections (2x MXU rate on the "
                    "encoder, halved decoder weight streaming; changes "
                    "outputs — validate with parity_check)")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--no_fuse", action="store_true",
                    help="skip the lossless inference projection fusion")
    ap.add_argument("--streaming", action="store_true",
                    help="continuous-batching greedy decode "
                    "(decode/streaming.py): rows refill as they finish, so "
                    "throughput tracks the mean label length instead of "
                    "the per-batch max; greedy only")
    ap.add_argument("--num_devices", type=int, default=1,
                    help="data-parallel decode across the first N local "
                    "devices: the batch axis is mesh-sharded and results "
                    "gathered (the reference's DP generate loop, "
                    "run_pseudo_labelling.py:330-341)")
    ap.add_argument("--mesh_model_axis", type=int, default=1,
                    help="tensor-parallel factor for the teacher (sharded "
                    "decode; combine with --num_devices)")
    from kotoba_whisper_tpu.cli import common

    common.add_distributed_flags(ap)
    arg = ap.parse_args(argv)

    import jax

    # multi-host: join the process group before any device use; each
    # process then decodes its own tar-shard slice on its LOCAL devices
    # and rank 0 merges the per-rank outputs (the reference's DP generate
    # loop with gather_for_metrics, run_pseudo_labelling.py:330-345,
    # restructured as idempotent per-host files)
    multiproc = common.init_distributed(arg)

    from kotoba_whisper_tpu.utils.backend import ensure_backend

    ensure_backend()
    import jax.numpy as jnp
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
    if arg.gemm_dtype != "compute":
        # composes with TP: core/mesh.py shards kernel_q/kernel_scale with
        # the same column/row-parallel rules as full-precision kernels
        # (tests/test_sharded.py::test_tp_decode_int8_gemm)
        params = common.quantize_if(params, arg.gemm_dtype)
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

    # in-driver DP/TP: shard the batch (and optionally the teacher) over a
    # local-device mesh; XLA inserts the collectives. The reference does
    # this with an accelerate-sharded dataloader + gather_for_metrics
    # (run_pseudo_labelling.py:330-341).
    mesh = None
    if arg.num_devices > 1 or arg.mesh_model_axis > 1:
        from kotoba_whisper_tpu.core.mesh import MeshConfig, build_mesh
        from kotoba_whisper_tpu.parallel import sharded

        n_dev = arg.num_devices * arg.mesh_model_axis
        # multi-process: DP-per-host — mesh over LOCAL devices only (each
        # host runs an independent decode program over its tar slice;
        # jax.devices() would return the global pool)
        pool = jax.local_devices() if multiproc else jax.devices()
        mesh = build_mesh(
            MeshConfig(data=arg.num_devices, model=arg.mesh_model_axis),
            pool[:n_dev],
        )
        params = sharded.place_params(
            mesh, params, model_sharded=arg.mesh_model_axis > 1
        )
        assert arg.batch_size % arg.num_devices == 0, (
            "batch_size must divide across --num_devices"
        )

    def place(mel):
        if mesh is None:
            return mel
        from kotoba_whisper_tpu.parallel import sharded

        return sharded.place_batch(mesh, mel)

    def wire(a: np.ndarray) -> np.ndarray:
        if arg.wire_dtype == "int16":
            return np.clip(
                np.round(a * 32768.0), -32768, 32767
            ).astype(np.int16)
        return a

    def generate(batch_audio: np.ndarray) -> dict[str, np.ndarray]:
        mel = place(
            log_mel_spectrogram(jnp.asarray(wire(batch_audio)), feat).astype(
                compute_dtype
            )
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
    shard_slice = (
        (jax.process_index(), jax.process_count()) if multiproc else None
    )
    utts = reazon.iter_dataset_dir(
        arg.dataset_dir, chunk_range=chunk_range, shard_slice=shard_slice
    )

    # multi-process: each rank writes its own subdir (idempotent per-host
    # files); rank 0 merges after the final barrier
    out_dir = (
        os.path.join(arg.output_dir, f"rank-{jax.process_index()}")
        if multiproc
        else arg.output_dir
    )
    os.makedirs(out_dir, exist_ok=True)
    jsonl_path = os.path.join(out_dir, "pseudo_labels.jsonl")
    csv_path = os.path.join(out_dir, "pseudo_labels.csv")
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

    main_key = next(iter(task_opts))

    def make_record(u, wav, per_task, bi, writer):
        record = {"name": u.name, "transcription": u.transcription}
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
        return record

    def rows_lockstep(writer):
        nonlocal n_done
        for batch, audio, arr in interleave_prefetch(host_batches()):
            if arg.limit is not None and n_done >= arg.limit:
                break
            if arr.shape[0] < arg.batch_size:
                # pad ragged batches to the full width: one compiled shape,
                # and DP sharding always divides
                pad_rows = arg.batch_size - arr.shape[0]
                arr = np.concatenate(
                    [arr, np.zeros((pad_rows,) + arr.shape[1:], arr.dtype)]
                )
            per_task = generate(arr)
            for bi, (u, wav) in enumerate(zip(batch, audio)):
                n_done += 1
                yield make_record(u, wav, per_task, bi, writer)

    def rows_streaming(writer):
        """Continuous batching: accumulate a super-batch of utterances,
        stream-decode it with row (greedy) or beam-group refill
        (throughput tracks the mean termination length), emit records in
        input order."""
        nonlocal n_done
        from kotoba_whisper_tpu.decode.streaming import (
            StreamConfig,
            generate_greedy_streaming,
        )
        from kotoba_whisper_tpu.decode.streaming_beam import (
            BeamStreamConfig,
            generate_beam_streaming,
        )

        if arg.num_beams > 1:
            groups = max(arg.batch_size // arg.num_beams, 1)
            bcfg = BeamStreamConfig(
                groups=groups,
                num_beams=arg.num_beams,
                encode_batch=max(min(groups // 2, 8), 1),
                steps_per_round=8,
            )
            encode_batch = bcfg.encode_batch
            super_n = groups * 4
        else:
            scfg = StreamConfig(
                batch=arg.batch_size,
                encode_batch=min(16, arg.batch_size),
                steps_per_round=8,
            )
            encode_batch = scfg.encode_batch
            super_n = arg.batch_size * 4

        def decode_stream(mels, opts):
            if arg.num_beams > 1:
                toks, _ = generate_beam_streaming(
                    params, cfg, mels, opts, tok.special,
                    compute_dtype=compute_dtype, attn_impl=attn_impl,
                    kv_dtype=arg.kv_dtype, stream=bcfg,
                )
                return toks
            return generate_greedy_streaming(
                params, cfg, mels, opts, tok.special,
                compute_dtype=compute_dtype, attn_impl=attn_impl,
                kv_dtype=arg.kv_dtype, stream=scfg,
            )

        def flush(buf):
            nonlocal n_done
            mels = np.concatenate([
                np.asarray(
                    log_mel_spectrogram(
                        jnp.asarray(
                            wire(np.stack([row for _, _, row in chunk]))
                        ),
                        feat,
                    ),
                    np.float32,
                )
                for chunk in common.batched(buf, encode_batch)
            ])
            per_task = {
                key: decode_stream(mels, opts)
                for key, opts in task_opts.items()
            }
            for bi, (u, wav, _) in enumerate(buf):
                n_done += 1
                yield make_record(u, wav, per_task, bi, writer)

        buf = []
        for batch, audio, arr in interleave_prefetch(host_batches()):
            for bi, (u, wav) in enumerate(zip(batch, audio)):
                if arg.limit is not None and n_done + len(buf) >= arg.limit:
                    break
                buf.append((u, wav, arr[bi]))
            if len(buf) >= super_n:
                yield from flush(buf[:super_n])
                buf = buf[super_n:]
            if arg.limit is not None and n_done + len(buf) >= arg.limit:
                break
        if buf:
            yield from flush(buf)

    def rows():
        with open(csv_path, "w", newline="") as cf:
            writer = csv.writer(cf)
            writer.writerow(["file_id", "whisper_transcript"])
            if arg.streaming and mesh is None:
                yield from rows_streaming(writer)
            else:
                if arg.streaming:
                    import sys

                    print(
                        "warning: --streaming needs a single device; "
                        "using lockstep batching",
                        file=sys.stderr,
                    )
                yield from rows_lockstep(writer)

    n = common.write_jsonl(jsonl_path, rows())
    rate = tp.rate()
    if multiproc:
        from kotoba_whisper_tpu.parallel import multihost

        multihost.barrier("pseudo_label_done")
        if multihost.is_main_process():
            n = _merge_rank_outputs(
                arg.output_dir, jax.process_count(), common
            )
        multihost.barrier("pseudo_label_merged")
    print(
        f"pseudo-labelled {n} utterances -> {jsonl_path} "
        f"({rate:.1f} audio-s/s/chip)"
    )


def _merge_rank_outputs(output_dir: str, n_ranks: int, common) -> int:
    """Merge rank-K subdir outputs into top-level files, ordered by
    utterance name (deterministic regardless of host count — the
    gather_for_metrics contract of run_pseudo_labelling.py:341 without a
    lockstep collective, so ragged per-host shard sizes can't deadlock)."""
    records = []
    for k in range(n_ranks):
        records.extend(common.read_jsonl(
            os.path.join(output_dir, f"rank-{k}", "pseudo_labels.jsonl")
        ))
    records.sort(key=lambda r: r["name"])
    n = common.write_jsonl(
        os.path.join(output_dir, "pseudo_labels.jsonl"), iter(records)
    )
    csv_rows = []
    for k in range(n_ranks):
        with open(os.path.join(output_dir, f"rank-{k}",
                               "pseudo_labels.csv"), newline="") as f:
            rd = csv.reader(f)
            next(rd, None)  # header
            csv_rows.extend(rd)
    csv_rows.sort(key=lambda r: r[0])
    with open(os.path.join(output_dir, "pseudo_labels.csv"), "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow(["file_id", "whisper_transcript"])
        w.writerows(csv_rows)
    return n


if __name__ == "__main__":
    main()
