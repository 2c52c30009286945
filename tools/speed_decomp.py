"""300 s latency decomposition (VERDICT r4 #8).

BASELINE.md's one latency point still behind the reference is the 300 s
serving row (2.27 s here vs 1.804 s on the reference's local cuda:0).
This tool splits one chunked-pipeline call (decode/pipeline.py semantics,
run_speed_eval.py:73-79 workload) into phases with the readback-fence
methodology, so the table can attribute the gap to device compute vs the
remote tunnel's dispatch/transfer overhead:

  host_chunk  chunk_audio + 30s pad/collate          (host CPU)
  h2d         audio upload + commit                  (tunnel)
  mel         on-device log-mel, fenced              (device)
  decode      greedy decode w/ KV cache, fenced      (device)
  d2h         token readback                         (tunnel)
  merge       stride merge + BPE decode to text      (host CPU)
  fused       mel+decode dispatched together, fenced (device, the
              production shape — separate fences add sync points)

Usage: python tools/speed_decomp.py [--duration 300] [--serving]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

from kotoba_whisper_tpu.utils.backend import ensure_backend

ensure_backend()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kotoba_whisper_tpu.cli import common  # noqa: E402
from kotoba_whisper_tpu.core.config import FeatureConfig  # noqa: E402
from kotoba_whisper_tpu.data.collator import (  # noqa: E402
    CollatorConfig,
    collate_audio,
)
from kotoba_whisper_tpu.decode.greedy import (  # noqa: E402
    GenerateOptions,
    generate_greedy,
)
from kotoba_whisper_tpu.decode.longform import (  # noqa: E402
    ChunkingConfig,
    chunk_audio,
    merge_chunk_segments,
)
from kotoba_whisper_tpu.eval.speed import generate_dummy_audio  # noqa: E402
from kotoba_whisper_tpu.ops.mel import log_mel_spectrogram  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=300.0)
    ap.add_argument("--model", default="preset:large-v3")
    ap.add_argument("--serving", action="store_true",
                    help="w8a8 projections + int8 KV (the serving config)")
    ap.add_argument("--max_length", type=int, default=32)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--attn", default="pallas")
    ap.add_argument("--wire", default="float32",
                    choices=["float32", "int16"],
                    help="int16: PCM wire format (half the h2d bytes; "
                    "normalized on device in ops/mel.py)")
    args = ap.parse_args()

    tok = common.load_tokenizer("byte")
    params, cfg = common.load_model(args.model)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    params = common.fuse_unless(params, False)
    kv = "compute"
    if args.serving:
        params = common.quantize_if(params, "int8")
        kv = "int8"
    feat = FeatureConfig(n_mels=cfg.num_mel_bins)
    chunking = ChunkingConfig(chunk_length_s=15.0)
    opts = GenerateOptions(
        prompt_ids=tuple(tok.sot_sequence("ja", "transcribe")),
        max_length=args.max_length, return_timestamps=True,
    )

    audio = generate_dummy_audio(args.duration)
    gen_kw = dict(compute_dtype=jnp.bfloat16, attn_impl=args.attn,
                  kv_dtype=kv)

    def fenced(x):
        np.asarray(x[-1, -1] if x.ndim > 1 else x[-1])

    def run_once(collect: dict | None):
        t = time.perf_counter()
        chunks = chunk_audio(audio, chunking)
        arr = collate_audio(
            [c.audio for c in chunks], CollatorConfig(n_samples=feat.n_samples)
        )
        if args.wire == "int16":
            arr = np.clip(np.round(arr * 32768.0), -32768, 32767).astype(
                np.int16
            )
        t1 = time.perf_counter()
        dev = jax.device_put(arr)
        dev.block_until_ready()
        t2 = time.perf_counter()
        mel = log_mel_spectrogram(dev, feat).astype(jnp.bfloat16)
        fenced(mel)
        t3 = time.perf_counter()
        toks = generate_greedy(params, cfg, mel, opts, tok.special, **gen_kw)
        fenced(toks)
        t4 = time.perf_counter()
        host_toks = np.asarray(toks)
        t5 = time.perf_counter()
        segs = merge_chunk_segments(tok, host_toks, chunks, chunking)
        text = "".join(s["text"] for s in segs) if segs else ""
        t6 = time.perf_counter()
        if collect is not None:
            for name, val in (
                ("host_chunk", t1 - t), ("h2d", t2 - t1), ("mel", t3 - t2),
                ("decode", t4 - t3), ("d2h", t5 - t4), ("merge", t6 - t5),
                ("total_split", t6 - t),
            ):
                collect.setdefault(name, []).append(val)
        return text

    def run_fused(collect: dict | None):
        """Production shape: one dispatch chain, one fence — what
        eval/speed.py times."""
        t = time.perf_counter()
        chunks = chunk_audio(audio, chunking)
        arr = collate_audio(
            [c.audio for c in chunks], CollatorConfig(n_samples=feat.n_samples)
        )
        if args.wire == "int16":
            arr = np.clip(np.round(arr * 32768.0), -32768, 32767).astype(
                np.int16
            )
        mel = log_mel_spectrogram(jnp.asarray(arr), feat).astype(jnp.bfloat16)
        toks = generate_greedy(params, cfg, mel, opts, tok.special, **gen_kw)
        host_toks = np.asarray(toks)
        segs = merge_chunk_segments(tok, host_toks, chunks, chunking)
        _ = "".join(s["text"] for s in segs) if segs else ""
        if collect is not None:
            collect.setdefault("fused_total", []).append(
                time.perf_counter() - t
            )

    # warmups (compile both program sets)
    run_once(None)
    run_fused(None)
    phases: dict = {}
    for _ in range(args.trials):
        run_once(phases)
    for _ in range(args.trials):
        run_fused(phases)

    out = {
        k: {"min_s": round(float(np.min(v)), 4),
            "mean_s": round(float(np.mean(v)), 4)}
        for k, v in phases.items()
    }
    out["n_chunks"] = len(chunk_audio(audio, chunking))
    out["config"] = {"duration": args.duration, "serving": args.serving,
                     "max_length": args.max_length, "attn": args.attn,
                     "wire": args.wire}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
