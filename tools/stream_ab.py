"""On-chip A/B: continuous-batching stream vs lockstep decode at the
REALISTIC pseudo-label length distribution (VERDICT r2 item 2).

Three measured configs on large-v3 (random bf16 weights, int8 KV, B=48):

- lockstep-real: the reference generate() loop shape
  (run_pseudo_labelling.py:333-344) — batches of 48, every batch decodes
  until its LONGEST row's stop (per-row early exit cannot free a row's
  slot), stops drawn from the same gamma fit as bench.py stream-real.
  Measured as decode-to-max-stop per batch with eot disabled, plus the
  same on-device mel+encode path.
- stream-real: decode/streaming.py on the same stops/seeds (bench.py's
  headline candidate), with KWT_STREAM_TRACE phase breakdown.
- stream-beam / lockstep-beam (optional, --beam): the same A/B for
  num_beams=5 at window geometry groups x 5.

Usage: python tools/stream_ab.py [--beam] [--n 192]
Each config prints one JSON line; run on the real chip.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _large_v3_setup, _realistic_stops  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=192)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--beam", action="store_true")
    ap.add_argument("--skip-lockstep", action="store_true")
    ap.add_argument("--skip-stream", action="store_true")
    ap.add_argument("--kv", default="int8",
                    choices=["compute", "int8", "int4"])
    args = ap.parse_args()

    from kotoba_whisper_tpu.utils.backend import enable_compilation_cache

    os.environ.setdefault("KWT_COMPILE_CACHE", "on")
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from kotoba_whisper_tpu.decode.greedy import (
        GenerateOptions,
        generate_greedy,
        transcribe_prompt,
    )
    from kotoba_whisper_tpu.decode.streaming import (
        StreamConfig,
        generate_greedy_streaming,
    )
    from kotoba_whisper_tpu.ops.mel import log_mel_spectrogram

    cfg, st, feat, params = _large_v3_setup()
    n, b = args.n, args.batch
    rng = np.random.default_rng(0)
    prompt = transcribe_prompt(st, st.lang_begin + 6)
    opts = GenerateOptions(prompt_ids=prompt, max_length=176)
    stops = _realistic_stops(n, len(prompt), rng)
    audio = jnp.asarray(
        rng.standard_normal((n, feat.n_samples)).astype(np.float32) * 0.1
    )

    def mel_all(a, eb=16):
        return jnp.concatenate([
            log_mel_spectrogram(a[i : i + eb], feat).astype(jnp.bfloat16)
            for i in range(0, a.shape[0], eb)
        ])

    if not args.skip_lockstep and not args.beam:
        # -- lockstep-real: per batch, rows run until the batch's max stop
        # (per-row stop_at + all-finished early exit == the reference
        # generate() loop under early stopping); ONE compiled program ----
        st_nx = dataclasses.replace(st, eot=-1)

        def one_batch(mel_b, stops_b):
            return generate_greedy(
                params, cfg, mel_b, opts, st_nx,
                compute_dtype=jnp.bfloat16, kv_dtype="int8",
                attn_impl="pallas", stop_at=jnp.asarray(stops_b, jnp.int32),
            )

        def fence(x):
            # remote plugin: block_until_ready does not fence device-
            # resident-input programs (DESIGN.md calibration note); a
            # readback of one element does
            return int(np.asarray(x[0, -1]))

        fence(one_batch(mel_all(audio[:b]), stops[:b]))  # compile
        t0 = time.perf_counter()
        mels = mel_all(audio)
        for i in range(0, n, b):
            fence(one_batch(mels[i : i + b], stops[i : i + b]))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "config": "lockstep-real",
            "value": round(n * feat.chunk_length_s / dt, 2),
            "detail": {
                "batch_max": [int(stops[i : i + b].max())
                              for i in range(0, n, b)],
                "mean_stop": round(float(stops.mean()), 1),
            },
        }), flush=True)

    if not args.skip_stream and not args.beam:
        os.environ.setdefault("KWT_STREAM_TRACE", "1")
        scfg = StreamConfig(batch=b, encode_batch=16, steps_per_round=8)
        kw = dict(compute_dtype=jnp.bfloat16, kv_dtype=args.kv, stream=scfg,
                  stop_at=stops, attn_impl="pallas")
        generate_greedy_streaming(
            params, cfg, mel_all(audio[: 2 * b]), opts, st, **kw
        )
        t0 = time.perf_counter()
        mels = mel_all(audio)
        out = generate_greedy_streaming(params, cfg, mels, opts, st, **kw)
        dt = time.perf_counter() - t0
        assert out.shape[0] == n
        print(json.dumps({
            "config": "stream-real",
            "value": round(n * feat.chunk_length_s / dt, 2),
            "detail": {"window": b, "kv": args.kv},
        }), flush=True)

    if args.beam:
        from kotoba_whisper_tpu.decode.beam import generate_beam
        from kotoba_whisper_tpu.decode.streaming_beam import (
            BeamStreamConfig,
            generate_beam_streaming,
        )

        k, g = 5, max(b // 5, 1)
        nb = int(os.environ.get("KWT_AB_N", "96"))
        ebatch = int(os.environ.get("KWT_AB_EBATCH", "4"))
        stops_b = stops[:nb]
        audio_b = audio[:nb]
        mels = mel_all(audio_b)

        if not args.skip_lockstep:
            # lockstep-beam: batches of g utts x5 beams, run to max stop
            def one_beam_batch(mel_b, max_len):
                o = dataclasses.replace(opts, max_length=max_len)
                return generate_beam(
                    params, cfg, mel_b, o, st, num_beams=k,
                    compute_dtype=jnp.bfloat16, kv_dtype="int8",
                )

            batch_len = [
                ((int(stops_b[i : i + g].max()) + 15) // 16) * 16
                for i in range(0, nb, g)
            ]

            def bfence(out):
                return int(np.asarray(out[0][0, -1]))  # readback fence

            for t in sorted(set(batch_len)):
                bfence(one_beam_batch(mels[:g], t))
            t0 = time.perf_counter()
            for i, t in zip(range(0, nb, g), batch_len):
                bfence(one_beam_batch(mels[i : i + g], t))
            dt = time.perf_counter() - t0
            print(json.dumps({
                "config": "lockstep-beam",
                "value": round(nb * feat.chunk_length_s / dt, 2),
            }), flush=True)

        scfg = BeamStreamConfig(
            groups=g, num_beams=k, encode_batch=ebatch, steps_per_round=8
        )
        kw = dict(compute_dtype=jnp.bfloat16, kv_dtype="int8", stream=scfg,
                  stop_at=stops_b)
        generate_beam_streaming(
            params, cfg, mel_all(audio_b[: 2 * g]), opts, st, **kw
        )
        t0 = time.perf_counter()
        mels = mel_all(audio_b)
        out, _ = generate_beam_streaming(
            params, cfg, mels, opts, st, **kw
        )
        dt = time.perf_counter() - t0
        assert out.shape[0] == nb
        print(json.dumps({
            "config": "stream-beam",
            "value": round(nb * feat.chunk_length_s / dt, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
