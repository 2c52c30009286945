"""Lockstep-beam per-phase attribution (VERDICT r4 #4).

Times, on real shapes (large-v3, groups x 5 beams), with readback fences:

  encode        encoder fwd on G rows
  init          init_cache cross-KV projection + quantize
  prefill       prompt prefill (t = p-1) over B*K rows
  step_shared   N pure decode steps, shared cross-KV (beam_size=K)
  step_repl     N pure decode steps, replicated cross-KV (beam_size=1,
                the pre-round-5 layout) — the A/B for the shared layout
  full          generate_beam end-to-end (adds rules/top-2K/reorder/
                bookkeeping on top of step_shared)

Usage: python tools/beam_exp.py [--groups 9] [--steps 32] [--gemm int8]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np

from kotoba_whisper_tpu.utils.backend import ensure_backend

ensure_backend()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kotoba_whisper_tpu.core.config import (  # noqa: E402
    FeatureConfig,
    PRESETS,
    SpecialTokens,
)
from kotoba_whisper_tpu.decode.beam import generate_beam  # noqa: E402
from kotoba_whisper_tpu.decode.greedy import (  # noqa: E402
    GenerateOptions,
    transcribe_prompt,
)
from kotoba_whisper_tpu.models import whisper  # noqa: E402
from kotoba_whisper_tpu.ops.mel import log_mel_spectrogram  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="large-v3")
    ap.add_argument("--groups", type=int, default=9)
    ap.add_argument("--beams", type=int, default=5)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--max_len", type=int, default=64)
    ap.add_argument("--gemm", default="compute", choices=["compute", "int8"])
    ap.add_argument("--kv", default="int8",
                    choices=["compute", "int8", "int4"])
    args = ap.parse_args()

    cfg = PRESETS[args.preset]
    st = SpecialTokens.for_vocab(cfg.vocab_size)
    feat = FeatureConfig(n_mels=cfg.num_mel_bins)
    params = whisper.init_params(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    from kotoba_whisper_tpu.models.optimized import fuse_for_inference

    params = fuse_for_inference(params)
    if args.gemm == "int8":
        from kotoba_whisper_tpu.models.quantized import quantize_for_inference

        params = quantize_for_inference(params)

    g, k = args.groups, args.beams
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((g, feat.n_samples)).astype(np.float32) * 0.1
    )
    mel = log_mel_spectrogram(audio, feat).astype(jnp.bfloat16)
    prompt = transcribe_prompt(st, st.lang_begin + 6)
    p = len(prompt)
    opts = GenerateOptions(prompt_ids=prompt, max_length=args.max_len)
    dt_kw = dict(compute_dtype=jnp.bfloat16, kv_dtype=args.kv)

    def fence(x):
        # single-element readback (a full-leaf np.asarray would transfer
        # the whole cache over the tunnel and double host memory)
        leaf = jax.tree.leaves(x)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    def timed(fn, *a, trials=args.trials, big=False, **kw):
        out = fn(*a, **kw)
        fence(out)
        times = []
        for _ in range(trials):
            if big:
                out = None  # don't hold two multi-GB outputs at once
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            fence(out)
            times.append(time.perf_counter() - t0)
        return out, float(np.min(times))

    results = {}

    def record(name, val):
        results[name] = val
        print(json.dumps({name: val}), flush=True)

    enc_fn = jax.jit(lambda pp, m: whisper.encode(
        pp, cfg, m, compute_dtype=jnp.bfloat16, attn_impl="xla"))
    enc, t = timed(enc_fn, params, mel)
    record("encode_ms", round(t * 1e3, 1))

    def mk_cache(pp, e, beam_size):
        return whisper.init_cache(
            pp, cfg, e, capacity=args.max_len,
            beam_size=beam_size, **dt_kw,
        )

    init_shared = jax.jit(lambda pp, e: mk_cache(pp, e, k))
    cache_s, t = timed(init_shared, params, enc, big=True)
    record("init_shared_ms", round(t * 1e3, 1))

    tokens = jnp.tile(jnp.asarray(prompt, jnp.int32)[None], (g * k, 1))

    @jax.jit
    def prefill(pp, cache):
        return whisper.decode(
            pp, cfg, tokens[:, : p - 1], cache=cache,
            compute_dtype=jnp.bfloat16, beam_size=k,
        )[1]

    cache_s2, t = timed(prefill, params, cache_s, big=True)
    record("prefill_ms", round(t * 1e3, 1))

    last = tokens[:, -1:]

    def steps(pp, cache, beam_size, n):
        def body(c, _):
            logits, c2 = whisper.decode(
                pp, cfg, last, cache=c,
                compute_dtype=jnp.bfloat16, beam_size=beam_size,
            )
            return c2, logits[:, 0, 0]
        c, outs = jax.lax.scan(body, cache, None, length=n)
        return outs

    steps_shared = jax.jit(lambda pp, c: steps(pp, c, k, args.steps))
    _, t = timed(steps_shared, params, cache_s2)
    record("step_shared_ms", round(t / args.steps * 1e3, 2))

    # replicated-cross A/B only after the shared caches are freed
    cache_s = cache_s2 = None
    enc_beams = jnp.broadcast_to(
        enc[:, None], (g, k) + enc.shape[1:]
    ).reshape((g * k,) + enc.shape[1:])
    init_repl = jax.jit(lambda pp, e: mk_cache(pp, e, 1))
    cache_r, t = timed(init_repl, params, enc_beams, big=True)
    record("init_repl_ms", round(t * 1e3, 1))
    enc_beams = None

    steps_repl = jax.jit(lambda pp, c: steps(pp, c, 1, args.steps))
    _, t = timed(steps_repl, params, cache_r)
    record("step_repl_ms", round(t / args.steps * 1e3, 2))
    cache_r = None

    # full beam search at a fixed length (no early stop: eot disabled)
    st_nx = dataclasses.replace(st, eot=-1)
    full = lambda m: generate_beam(  # noqa: E731
        params, cfg, m, opts, st_nx, num_beams=k,
        compute_dtype=jnp.bfloat16, kv_dtype=args.kv, attn_impl="xla",
    )
    out, t = timed(full, mel, big=True)
    n_gen = args.max_len - p
    results["full_ms"] = round(t * 1e3, 1)
    results["full_per_step_ms"] = round(
        (t * 1e3 - results["encode_ms"] - results["init_shared_ms"]
         - results["prefill_ms"]) / n_gen, 2,
    )
    results["config"] = {
        "groups": g, "beams": k, "gemm": args.gemm, "kv": args.kv,
        "steps": args.steps, "max_len": args.max_len,
    }
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
