"""Continuous-batching decode phase attribution (real-chip harness).

The round-2 bench showed stream-real at 329 audio-s/s/chip vs 725 for
lockstep fixed-48 — the opposite of what refill-on-finish should give at
a ~25-token mean. This harness times each phase of decode/streaming.py in
isolation (encode+cross-init+prefill pool prep, the refill scatter, and
the per-round decode steps) so the regression can be attributed before
redesigning.

Usage: python tools/stream_exp.py [--window 48] [--encode_batch 16]
       [--kv int8] [--rounds 6] [--steps 8]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from kotoba_whisper_tpu.core.config import FeatureConfig, PRESETS, SpecialTokens
from kotoba_whisper_tpu.decode.greedy import (
    GenerateOptions,
    generate_greedy,
    transcribe_prompt,
)
from kotoba_whisper_tpu.decode import streaming
from kotoba_whisper_tpu.models import whisper
from kotoba_whisper_tpu.models.optimized import fuse_for_inference
from kotoba_whisper_tpu.ops.mel import log_mel_spectrogram


def sync(x):
    jax.block_until_ready(x)
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=48)
    ap.add_argument("--encode_batch", type=int, default=16)
    ap.add_argument("--kv", default="int8")
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--preset", default="large-v3")
    ap.add_argument("--lockstep", action="store_true",
                    help="also time lockstep greedy (fixed 8+prompt tokens) "
                    "at the same window batch for a per-step reference")
    args = ap.parse_args()

    cfg = PRESETS[args.preset]
    st = SpecialTokens.for_vocab(cfg.vocab_size)
    feat = FeatureConfig(n_mels=cfg.num_mel_bins)
    params = whisper.init_params(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    params = fuse_for_inference(params)

    rng = np.random.default_rng(0)
    w, e = args.window, args.encode_batch
    audio = rng.standard_normal((e, feat.n_samples)).astype(np.float32) * 0.1
    mel = sync(log_mel_spectrogram(jnp.asarray(audio), feat))

    prompt = transcribe_prompt(st, st.lang_begin + 6)
    opts = GenerateOptions(prompt_ids=prompt, max_length=176)
    kw = dict(compute_dtype=jnp.bfloat16, attn_impl="xla", kv_dtype=args.kv)
    out = {}

    if args.lockstep:
        import dataclasses
        mel_w = jnp.tile(mel, (w // e + 1, 1, 1))[:w]
        st_fixed = dataclasses.replace(st, eot=-1)
        o = dataclasses.replace(opts, max_length=len(prompt) + args.steps)
        sync(generate_greedy(params, cfg, mel_w, o, st_fixed,
                             compute_dtype=jnp.bfloat16, kv_dtype=args.kv))
        t0 = time.perf_counter()
        sync(generate_greedy(params, cfg, mel_w, o, st_fixed,
                             compute_dtype=jnp.bfloat16, kv_dtype=args.kv))
        dt = time.perf_counter() - t0
        out["lockstep_e2e_ms"] = round(dt * 1e3, 1)
        print(json.dumps(out))
        return  # exclusive: lockstep buffers + stream window OOM together

    # --- phase: empty state ------------------------------------------------
    t0 = time.perf_counter()
    state = sync(streaming._empty_state(params, cfg, opts, rows=w, **kw))
    out["empty_state_ms"] = round((time.perf_counter() - t0) * 1e3, 1)

    # --- phase: fused encode+refill (one donated program) --------------------
    tokens_pool = jnp.asarray(
        np.asarray(streaming._prompt_tokens(opts, cfg.pad_token_id, e))
    )
    stops = jnp.full((e,), 40, jnp.int32)
    utts = jnp.arange(e, dtype=jnp.int32)
    valid = jnp.ones((e,), bool)
    state = streaming._encode_refill(
        params, cfg, state, mel, tokens_pool, stops, utts, valid,
        opts=opts, **kw,
    )
    sync(state.tokens)  # compile
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        state = streaming._encode_refill(
            params, cfg, state, mel, tokens_pool, stops, utts + i * e,
            valid, opts=opts, **kw,
        )
        sync(state.tokens)
        times.append(time.perf_counter() - t0)
    out["encode_refill_ms"] = round(float(np.min(times)) * 1e3, 1)

    # --- phase: decode rounds -------------------------------------------------
    # fill the whole window first so steps run at full occupancy
    while True:
        got = int(np.sum(np.asarray(state.active)))
        if got >= w:
            break
        state = streaming._encode_refill(
            params, cfg, state, mel, tokens_pool,
            jnp.full((e,), 176, jnp.int32), utts, valid, opts=opts, **kw,
        )
    sync(state.tokens)
    step_kw = dict(n_steps=args.steps, **kw)
    never = jnp.asarray(w + 1, jnp.int32)  # fixed-length rounds for timing
    state = streaming._steps(params, cfg, state, opts, st, never, **step_kw)
    sync(state.tokens)  # compile
    times = []
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        state = streaming._steps(
            params, cfg, state, opts, st, never, **step_kw
        )
        sync(state.tokens)
        times.append(time.perf_counter() - t0)
    out["round_ms"] = round(float(np.min(times)) * 1e3, 1)
    out["per_step_ms"] = round(float(np.min(times)) / args.steps * 1e3, 2)
    out["config"] = {"window": w, "encode_batch": e, "kv": args.kv}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
