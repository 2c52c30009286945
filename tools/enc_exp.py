"""Encoder layout/fusion experiments (real-chip timing harness).

docs/DESIGN.md identified unharvested encoder headroom from the compiled
HLO: three ~61 MB {2,1,0}<->{2,0,1} layout copies of the activations per
scan iteration plus several fp32 LayerNorm passes — the encoder runs at
~58% of its matmul roofline and now dominates pseudo-label wall time at
B>=32. This harness times `encode` variants that change the scan-carry
layout / fusion structure WITHOUT touching library code; a winning variant
graduates into models/whisper.py.

Variants:
  baseline  current models/whisper.encode (3D (B,T,D) carry, XLA attention)
  tbd       (T,B,D) scan carry — matches the {2,0,1} layout XLA keeps
            copying to, so the copies should vanish
  flat2d    (B*T, D) scan carry — 2D row-major, reshape to heads only
            inside attention
  unroll8   lax.scan(unroll=8) — layout assignment across 8 fused bodies
  pallas    baseline carry + Pallas flash attention (no (B,H,T,T) scores)
  tbd_pallas combined

Usage: python tools/enc_exp.py --variant baseline --batch 32 [--trials 5]
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from kotoba_whisper_tpu.core.config import PRESETS, WhisperConfig
from kotoba_whisper_tpu.models import whisper
from kotoba_whisper_tpu.models.optimized import fuse_for_inference
from kotoba_whisper_tpu.models.whisper import (
    conv1d,
    dense,
    layer_norm,
    merge_heads,
    qkv_projections,
    split_heads,
)
from kotoba_whisper_tpu.ops.attention import attention


def _stem(params, cfg, input_features, compute_dtype):
    enc = params["encoder"]
    x = jnp.transpose(input_features, (0, 2, 1)).astype(compute_dtype)
    x = jax.nn.gelu(conv1d(enc["conv1"], x, 1), approximate=False)
    x = jax.nn.gelu(conv1d(enc["conv2"], x, 2), approximate=False)
    return x + enc["pos_embedding"].astype(compute_dtype)[None]


def encode_tbd(params, cfg, input_features, *, compute_dtype, attn_impl="xla"):
    """Scan carry physically (T, B, D): the layout XLA's attention side
    wants, so the per-iteration relayout copies disappear."""
    enc = params["encoder"]
    x = _stem(params, cfg, input_features, compute_dtype)
    x = jnp.transpose(x, (1, 0, 2))  # (T, B, D)
    n_heads = cfg.encoder_attention_heads
    eps = cfg.layer_norm_eps

    def attn_tbd(p, h):
        t, b, d = h.shape
        if "qkv_proj" in p:
            qkv = dense(p["qkv_proj"], h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = dense(p["q_proj"], h)
            k = dense(p["k_proj"], h)
            v = dense(p["v_proj"], h)
        hd = d // n_heads
        q = q.reshape(t, b, n_heads, hd)
        k = k.reshape(t, b, n_heads, hd)
        v = v.reshape(t, b, n_heads, hd)
        scale = jnp.asarray(1.0 / hd**0.5, h.dtype)
        scores = jnp.einsum(
            "qbhd,kbhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
        )
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        o = jnp.einsum(
            "bhqk,kbhd->qbhd", probs.astype(h.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        return dense(p["out_proj"], o.reshape(t, b, d))

    def block(x, lp):
        h = layer_norm(lp["self_attn_layer_norm"], x, eps)
        x = x + attn_tbd(lp["self_attn"], h)
        h = layer_norm(lp["final_layer_norm"], x, eps)
        h = jax.nn.gelu(dense(lp["fc1"], h), approximate=False)
        x = x + dense(lp["fc2"], h)
        return x, None

    x, _ = jax.lax.scan(block, x, enc["layers"])
    x = layer_norm(enc["layer_norm"], x, eps)
    return jnp.transpose(x, (1, 0, 2))


def encode_flat2d(params, cfg, input_features, *, compute_dtype, attn_impl="xla"):
    """Scan carry (B*T, D); 3D/4D shapes exist only inside attention."""
    enc = params["encoder"]
    x = _stem(params, cfg, input_features, compute_dtype)
    b, t, d = x.shape
    x = x.reshape(b * t, d)
    n_heads = cfg.encoder_attention_heads
    eps = cfg.layer_norm_eps

    def block(x, lp):
        h = layer_norm(lp["self_attn_layer_norm"], x, eps)
        h3 = h.reshape(b, t, d)
        o = whisper.mha(lp["self_attn"], h3, h3, n_heads, impl=attn_impl)
        x = x + o.reshape(b * t, d)
        h = layer_norm(lp["final_layer_norm"], x, eps)
        h = jax.nn.gelu(dense(lp["fc1"], h), approximate=False)
        x = x + dense(lp["fc2"], h)
        return x, None

    x, _ = jax.lax.scan(block, x, enc["layers"])
    x = layer_norm(enc["layer_norm"], x, eps)
    return x.reshape(b, t, d)


def encode_unroll(params, cfg, input_features, *, compute_dtype,
                  attn_impl="xla", unroll=8):
    enc = params["encoder"]
    x = _stem(params, cfg, input_features, compute_dtype)
    n_heads = cfg.encoder_attention_heads
    eps = cfg.layer_norm_eps

    def block(x, lp):
        h = layer_norm(lp["self_attn_layer_norm"], x, eps)
        x = x + whisper.mha(lp["self_attn"], h, h, n_heads, impl=attn_impl)
        h = layer_norm(lp["final_layer_norm"], x, eps)
        h = jax.nn.gelu(dense(lp["fc1"], h), approximate=False)
        x = x + dense(lp["fc2"], h)
        return x, None

    x, _ = jax.lax.scan(block, x, enc["layers"], unroll=unroll)
    return layer_norm(enc["layer_norm"], x, eps)


def encode_fused_ln(params, cfg, input_features, *, compute_dtype,
                    attn_impl="xla"):
    """Baseline 3D carry + Pallas fused (residual-add + LayerNorm): one HBM
    pass where XLA's LN fusions take several (docs/DESIGN.md headroom)."""
    from kotoba_whisper_tpu.ops.layer_norm import add_layer_norm, layer_norm

    enc = params["encoder"]
    x = _stem(params, cfg, input_features, compute_dtype)
    n_heads = cfg.encoder_attention_heads
    eps = cfg.layer_norm_eps

    def block(x, lp):
        h = layer_norm(
            x, lp["self_attn_layer_norm"]["scale"],
            lp["self_attn_layer_norm"]["bias"], eps=eps,
        )
        attn_out = whisper.mha(lp["self_attn"], h, h, n_heads, impl=attn_impl)
        x, h = add_layer_norm(
            x, attn_out, lp["final_layer_norm"]["scale"],
            lp["final_layer_norm"]["bias"], eps=eps,
        )
        h = jax.nn.gelu(dense(lp["fc1"], h), approximate=False)
        x = x + dense(lp["fc2"], h)
        return x, None

    x, _ = jax.lax.scan(block, x, enc["layers"])
    return layer_norm(
        x, enc["layer_norm"]["scale"], enc["layer_norm"]["bias"], eps=eps
    )


def encode_bf16out(params, cfg, input_features, *, compute_dtype):
    """Baseline structure but matmuls emit bf16 directly (no fp32
    accumulator tensor materialized then cast): tests whether XLA fuses the
    fp32->bf16 epilogue or pays 2x write traffic for it. (MXU partial sums
    stay fp32 in-register either way; only the output rounding point moves.)"""
    enc = params["encoder"]
    x = _stem(params, cfg, input_features, compute_dtype)
    n_heads = cfg.encoder_attention_heads
    eps = cfg.layer_norm_eps

    def dense_b16(p, x):
        y = jnp.einsum("...i,io->...o", x, p["kernel"].astype(x.dtype))
        if "bias" in p:
            y = y + p["bias"].astype(x.dtype)
        return y

    def attn(p, h):
        if "qkv_proj" in p:
            qkv = dense_b16(p["qkv_proj"], h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q, k, v = (dense_b16(p[n], h) for n in ("q_proj", "k_proj", "v_proj"))
        o = attention(
            split_heads(q, n_heads), split_heads(k, n_heads),
            split_heads(v, n_heads),
        )
        return dense_b16(p["out_proj"], merge_heads(o))

    def block(x, lp):
        h = layer_norm(lp["self_attn_layer_norm"], x, eps)
        x = x + attn(lp["self_attn"], h)
        h = layer_norm(lp["final_layer_norm"], x, eps)
        h = jax.nn.gelu(dense_b16(lp["fc1"], h), approximate=False)
        x = x + dense_b16(lp["fc2"], h)
        return x, None

    x, _ = jax.lax.scan(block, x, enc["layers"])
    return layer_norm(enc["layer_norm"], x, eps)


def encode_ablate(params, cfg, input_features, *, compute_dtype,
                  no_softmax=False, no_gelu=False, no_ln=False):
    """Ablation profiling: strip one non-GEMM component at a time to
    attribute the gap between the encoder's ~64 TFLOP/s and the 171 TFLOP/s
    a pure dense chain achieves (tools/matmul_cal.py). NOT numerically
    valid — timing only."""
    enc = params["encoder"]
    x = _stem(params, cfg, input_features, compute_dtype)
    n_heads = cfg.encoder_attention_heads
    eps = cfg.layer_norm_eps

    def ln(p, h):
        return h if no_ln else layer_norm(p, h, eps)

    def gelu(h):
        return h if no_gelu else jax.nn.gelu(h, approximate=False)

    def attn(p, h):
        q, k, v = qkv_projections(p, h, h, n_heads)
        if no_softmax:
            o = v + 0.0 * q + 0.0 * k  # keep projections live, skip scores
        else:
            o = attention(q, k, v)
        return dense(p["out_proj"], merge_heads(o))

    def block(x, lp):
        h = ln(lp["self_attn_layer_norm"], x)
        x = x + attn(lp["self_attn"], h)
        h = ln(lp["final_layer_norm"], x)
        h = gelu(dense(lp["fc1"], h))
        x = x + dense(lp["fc2"], h)
        return x, None

    x, _ = jax.lax.scan(block, x, enc["layers"])
    return layer_norm(enc["layer_norm"], x, eps)


VARIANTS = {
    "baseline": lambda p, c, f, dt: whisper.encode(p, c, f, compute_dtype=dt),
    "tbd": lambda p, c, f, dt: encode_tbd(p, c, f, compute_dtype=dt),
    "flat2d": lambda p, c, f, dt: encode_flat2d(p, c, f, compute_dtype=dt),
    "unroll8": lambda p, c, f, dt: encode_unroll(p, c, f, compute_dtype=dt),
    "pallas": lambda p, c, f, dt: whisper.encode(
        p, c, f, compute_dtype=dt, attn_impl="pallas"
    ),
    "bf16out": lambda p, c, f, dt: encode_bf16out(p, c, f, compute_dtype=dt),
    "ab_nosoftmax": lambda p, c, f, dt: encode_ablate(
        p, c, f, compute_dtype=dt, no_softmax=True
    ),
    "ab_nogelu": lambda p, c, f, dt: encode_ablate(
        p, c, f, compute_dtype=dt, no_gelu=True
    ),
    "ab_noln": lambda p, c, f, dt: encode_ablate(
        p, c, f, compute_dtype=dt, no_ln=True
    ),
    "ab_gemmonly": lambda p, c, f, dt: encode_ablate(
        p, c, f, compute_dtype=dt, no_softmax=True, no_gelu=True, no_ln=True
    ),
    "fused_ln": lambda p, c, f, dt: encode_fused_ln(p, c, f, compute_dtype=dt),
    "fused_ln_pallas": lambda p, c, f, dt: encode_fused_ln(
        p, c, f, compute_dtype=dt, attn_impl="pallas"
    ),
    "tbd_pallas": lambda p, c, f, dt: encode_tbd(
        p, c, f, compute_dtype=dt, attn_impl="pallas"
    ),
}


def _quantized_variant(attn_impl):
    from kotoba_whisper_tpu.models.quantized import quantize_for_inference

    cache = {}

    def run(p, c, f, dt):
        if id(p) not in cache:
            cache[id(p)] = quantize_for_inference(p, parts=("encoder",))
        return whisper.encode(
            cache[id(p)], c, f, compute_dtype=dt, attn_impl=attn_impl
        )

    return run


VARIANTS["int8"] = _quantized_variant("xla")
VARIANTS["int8_pallas"] = _quantized_variant("pallas")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True, choices=sorted(VARIANTS))
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--preset", default="large-v3")
    ap.add_argument("--check", action="store_true",
                    help="compare outputs vs baseline (small preset, CPU ok)")
    args = ap.parse_args()

    cfg = PRESETS[args.preset]
    params = whisper.init_params(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    params = fuse_for_inference(params)

    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal(
            (args.batch, cfg.num_mel_bins, cfg.max_source_positions * 2)
        ).astype(np.float32)
        * 0.1
    )

    fn = jax.jit(
        functools.partial(VARIANTS[args.variant], c=cfg, dt=jnp.bfloat16)
    )
    if args.check:
        base = jax.jit(
            functools.partial(VARIANTS["baseline"], c=cfg, dt=jnp.bfloat16)
        )(params, f=feats)
        got = fn(params, f=feats)
        diff = float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - base.astype(jnp.float32)))
        )
        print(json.dumps({"variant": args.variant, "max_abs_diff": diff}))
        return

    t0 = time.perf_counter()
    out = fn(params, f=feats)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(args.trials):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(params, f=feats))
        times.append(time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "variant": args.variant,
                "batch": args.batch,
                "ms_mean": round(float(np.mean(times)) * 1e3, 2),
                "ms_min": round(float(np.min(times)) * 1e3, 2),
                "compile_s": round(compile_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
