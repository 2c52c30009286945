"""Decode-step attribution at the current frontier (VERDICT r3 #4).

Times the large-v3 incremental decode step at B=48 / int8 KV / fused-qkv
/ flat-KV — the fixed-48 bench's inner loop — under targeted ablations so
the per-step cost splits into its physical terms:

- `full`:      one decode step + logits + timestamp rules + argmax
               (exactly the generate_greedy body, decode/greedy.py:119).
- `no_head`:   the same step returning the last hidden state only —
               full − no_head = logits projection + rules + argmax.
- `cross_t64`: cross-attention KV sliced 1500 → 64 source positions —
               full − cross_t64 ≈ the cross-KV HBM streaming term
               (32 layers × 2 tensors × (48,1500,1280) int8 per step).
- `w8a8`:      full with int8-quantized dense projections
               (models/quantized.py) — full − w8a8 ≈ HALF the decoder
               weight-streaming term (bf16 → int8 halves the bytes), so
               weights ≈ 2 × (full − w8a8).

Each variant runs `--steps` decode steps inside ONE jitted lax.scan (the
per-step dispatch/host cost is excluded — it is measured separately by
the full-vs-sum residual against bench.py's fixed-48 per-step time).
Timings go through a readback fence (this remote-attached chip does not
fence device-resident-input programs on block_until_ready).

Usage: python tools/dec_exp.py [--batch 48] [--steps 48] [--trials 3]
       [--variants full,no_head,cross_t64,w8a8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--kv", default="int8")
    ap.add_argument(
        "--variants", default="full,no_head,cross_t64,w8a8"
    )
    ap.add_argument("--preset", default="large-v3",
                    help="non-default presets build fresh (CPU smoke)")
    args = ap.parse_args()

    os.environ.setdefault("KWT_COMPILE_CACHE", "on")
    from kotoba_whisper_tpu.utils.backend import ensure_backend

    # honors KWT_PLATFORM=cpu (the CI smoke test) and enables the cache
    ensure_backend()

    from bench import _large_v3_setup
    from kotoba_whisper_tpu.decode.greedy import (
        GenerateOptions,
        transcribe_prompt,
    )
    from kotoba_whisper_tpu.decode.logits_rules import apply_rules
    from kotoba_whisper_tpu.models import whisper
    from kotoba_whisper_tpu.models.quantized import quantize_for_inference

    if args.preset == "large-v3":
        cfg, st, feat, params = _large_v3_setup()
    else:
        from kotoba_whisper_tpu.core.config import PRESETS, SpecialTokens
        from kotoba_whisper_tpu.models.optimized import fuse_for_inference

        cfg = PRESETS[args.preset]
        st = SpecialTokens.for_vocab(cfg.vocab_size)
        params = whisper.init_params(jax.random.key(0), cfg)
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        params = fuse_for_inference(params)
    b, n_steps = args.batch, args.steps
    prompt = transcribe_prompt(st, st.lang_begin + 6)
    p = len(prompt)
    max_len = p + n_steps + 2
    opts = GenerateOptions(prompt_ids=prompt, max_length=max_len)
    rc = opts.rule_config(st)

    rng = np.random.default_rng(0)
    # encoder output synthesized directly — the encoder pass is attributed
    # separately (docs/DESIGN.md encoder-headroom section); this harness
    # isolates the decode step.
    enc_full = jnp.asarray(
        rng.standard_normal((b, cfg.max_source_positions, cfg.d_model)),
        jnp.bfloat16,
    )

    @jax.jit
    def make_cache(params, enc, tokens0):
        """Cache init + prompt prefill — OUTSIDE the timed region (the
        int8 cross-KV quantization cost is a per-batch init cost, not a
        per-step cost; including it would pollute the cross_t64 delta)."""
        cache = whisper.init_cache(
            params, cfg, enc, capacity=max_len,
            compute_dtype=jnp.bfloat16, kv_dtype=args.kv,
        )
        _, cache = whisper.decode(
            params, cfg, tokens0[:, : p - 1], cache=cache,
            compute_dtype=jnp.bfloat16,
        )
        return cache

    @partial(jax.jit, static_argnames=("head",), donate_argnums=(1,))
    def run_steps(params, cache, tokens0, *, head: bool):
        def body(carry, _):
            tokens, cache, cur_len = carry
            last = jax.lax.dynamic_slice_in_dim(tokens, cur_len - 1, 1, 1)
            logits, cache = whisper.decode(
                params, cfg, last, cache=cache, compute_dtype=jnp.bfloat16,
            )
            if head:
                masked = apply_rules(
                    logits[:, 0].astype(jnp.float32), tokens, cur_len, rc
                )
                nxt = jnp.argmax(masked, -1).astype(jnp.int32)
            else:
                # consume the pre-logits activations only: feed a constant
                # token so the logits matmul/rules/argmax leave the program
                nxt = jnp.full((b,), 42, jnp.int32) + (
                    logits[:, 0, 0].astype(jnp.int32) * 0
                )
            tokens = jax.lax.dynamic_update_slice_in_dim(
                tokens, nxt[:, None], cur_len, 1
            )
            return (tokens, cache, cur_len + 1), None

        (tokens, cache, _), _ = jax.lax.scan(
            body, (tokens0, cache, jnp.asarray(p, jnp.int32)),
            None, length=n_steps,
        )
        # cache is returned so the donated input buffers alias the output
        # (no defensive copy of the multi-GB KV state at program entry)
        return tokens, cache

    tokens0 = jnp.zeros((b, max_len), jnp.int32)
    tokens0 = tokens0.at[:, :p].set(jnp.asarray(prompt, jnp.int32)[None])

    def timed(pp, enc, head):
        # fresh cache per call: run_steps donates it (no defensive copy of
        # the multi-GB KV state inside the timed program)
        cache = make_cache(pp, enc, tokens0)
        out, _ = run_steps(pp, cache, tokens0, head=head)
        np.asarray(out[-1, -1])  # compile + fence
        times = []
        for _ in range(args.trials):
            cache = make_cache(pp, enc, tokens0)
            np.asarray(cache.length)  # fence the un-timed init
            t0 = time.perf_counter()
            out, _ = run_steps(pp, cache, tokens0, head=head)
            np.asarray(out[-1, -1])
            times.append(time.perf_counter() - t0)
        return float(np.min(times))

    def run_w8a8():
        # the bf16 projections must be freed before the quantized cache
        # allocates (bf16 3.1 GB + int8 1.7 GB + 5.9 GB cross-KV OOMs a
        # 16 GB v5e) — so w8a8 must be the LAST variant of a run
        nonlocal params
        qp = quantize_for_inference(params)
        params = None
        return timed(qp, enc_full, True)

    variants = {
        "full": lambda: timed(params, enc_full, True),
        "no_head": lambda: timed(params, enc_full, False),
        "cross_t64": lambda: timed(params, enc_full[:, :64], True),
        "w8a8": run_w8a8,
    }
    out = {"config": {"batch": b, "steps": n_steps, "kv": args.kv}}
    for name in args.variants.split(","):
        dt = variants[name]()
        out[name] = {
            "total_ms": round(dt * 1e3, 1),
            "per_step_ms": round(dt / n_steps * 1e3, 3),
        }
        print(json.dumps({name: out[name]}), flush=True)

    if {"full", "no_head", "cross_t64", "w8a8"} <= set(out):
        f = out["full"]["per_step_ms"]
        attr = {
            "logits_rules_argmax_ms": round(f - out["no_head"]["per_step_ms"], 3),
            "cross_kv_stream_ms": round(f - out["cross_t64"]["per_step_ms"], 3),
            "weight_stream_ms": round(
                2 * (f - out["w8a8"]["per_step_ms"]), 3
            ),
        }
        attr["residual_ms"] = round(f - sum(attr.values()), 3)
        out["attribution_per_step"] = attr
        print(json.dumps({"attribution_per_step": attr}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
