"""Conv-stem A/B harness (VERDICT r4 #2): measure the audio stem's share
of the encoder and compare stem implementations at production shapes.

The reference executes the stem inside WhisperForConditionalGeneration
(Conv1d(k=3,s=1)+GELU -> Conv1d(k=3,s=2)+GELU, run_distillation.py:466-484
via HF). SURVEY §2.2 named a Pallas stem kernel as a north-star candidate;
this harness provides the data to build it or retire it:

  variants:
    encoder     full encoder forward (the denominator for the stem share)
    stem_conv   current path: lax.conv_general_dilated + exact GELU
    stem_mm     im2col matmul reformulation: concat 3 shifted views ->
                one (3*C_in, C_out) GEMM per conv (explicitly
                MXU-shaped; XLA cannot mis-lower a dot)

Prints one JSON line per variant {name, ms, audio_share_pct, tflops}.

Usage: python tools/stem_exp.py [--batch 48] [--trials 5] [--preset large-v3]
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

from kotoba_whisper_tpu.core.config import PRESETS  # noqa: E402
from kotoba_whisper_tpu.models import whisper  # noqa: E402
from kotoba_whisper_tpu.ops.conv_stem import conv_stem_pallas  # noqa: E402


def stem_conv(enc, x, dtype):
    """The production stem: models/whisper.py conv1d path."""
    h = jnp.transpose(x, (0, 2, 1)).astype(dtype)
    h = jax.nn.gelu(whisper.conv1d(enc["conv1"], h, 1), approximate=False)
    h = jax.nn.gelu(whisper.conv1d(enc["conv2"], h, 2), approximate=False)
    return h


def _mm_conv(p, x, stride, dtype):
    """k=3 conv as one GEMM over 3 shifted views (pad=1 both ends)."""
    k = p["kernel"].astype(dtype)  # (3, C_in, C_out)
    kc = k.reshape(3 * k.shape[1], k.shape[2])
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    t_out = x.shape[1] // stride
    wins = [xp[:, d : d + x.shape[1] : stride][:, :t_out] for d in range(3)]
    xw = jnp.concatenate(wins, axis=-1)  # (B, T_out, 3*C_in)
    y = jnp.einsum(
        "btc,cd->btd", xw, kc,
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    return y + p["bias"].astype(dtype)


def stem_mm(enc, x, dtype):
    h = jnp.transpose(x, (0, 2, 1)).astype(dtype)
    h = jax.nn.gelu(_mm_conv(enc["conv1"], h, 1, dtype), approximate=False)
    h = jax.nn.gelu(_mm_conv(enc["conv2"], h, 2, dtype), approximate=False)
    return h


def _mm3_conv(p, x, stride, dtype):
    """k=3 conv as THREE shifted GEMMs accumulated — no im2col temp; each
    dot is (B*T_out, C_in) @ (C_in, C_out) on the MXU and the adds fuse
    into the epilogue."""
    k = p["kernel"].astype(dtype)  # (3, C_in, C_out)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    t_out = x.shape[1] // stride
    y = p["bias"].astype(jnp.float32)
    acc = None
    for d in range(3):
        w = xp[:, d : d + x.shape[1] : stride][:, :t_out]
        part = jnp.einsum(
            "btc,cd->btd", w, k[d], preferred_element_type=jnp.float32
        )
        acc = part if acc is None else acc + part
    return (acc + y).astype(dtype)


def stem_mm3(enc, x, dtype):
    h = jnp.transpose(x, (0, 2, 1)).astype(dtype)
    h = jax.nn.gelu(_mm3_conv(enc["conv1"], h, 1, dtype), approximate=False)
    h = jax.nn.gelu(_mm3_conv(enc["conv2"], h, 2, dtype), approximate=False)
    return h


def stem_ncw(enc, x, dtype):
    """Feed (B, C, T) directly — XLA picks the layout, no pre-transpose."""
    h = x.astype(dtype)
    for name, stride in (("conv1", 1), ("conv2", 2)):
        p = enc[name]
        h = jax.lax.conv_general_dilated(
            h, p["kernel"].astype(dtype),
            window_strides=(stride,), padding=[(1, 1)],
            dimension_numbers=("NCW", "WIO", "NCW"),
            preferred_element_type=jnp.float32,
        ).astype(dtype) + p["bias"].astype(dtype)[:, None]
        h = jax.nn.gelu(h, approximate=False)
    return jnp.transpose(h, (0, 2, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--preset", default="large-v3")
    ap.add_argument("--attn", default="xla")
    args = ap.parse_args()

    cfg = PRESETS[args.preset]
    params = whisper.init_params(jax.random.key(0), cfg)
    params = jax.tree.map(lambda v: v.astype(jnp.bfloat16), params)
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    b = args.batch
    x = jnp.asarray(
        rng.standard_normal((b, cfg.num_mel_bins, 3000)) * 0.3, dtype
    )

    d = cfg.d_model
    t = 3000
    # MXU work: conv1 B*T*(3*mels)*d MACs, conv2 B*(T/2)*(3*d)*d MACs
    stem_flops = 2 * b * t * 3 * cfg.num_mel_bins * d + 2 * b * (
        t // 2
    ) * 3 * d * d

    def stem_conv_nogelu(enc, v):
        h = jnp.transpose(v, (0, 2, 1)).astype(dtype)
        h = whisper.conv1d(enc["conv1"], h, 1)
        return whisper.conv1d(enc["conv2"], h, 2)

    def stem_conv_tanhgelu(enc, v):
        h = jnp.transpose(v, (0, 2, 1)).astype(dtype)
        h = jax.nn.gelu(whisper.conv1d(enc["conv1"], h, 1), approximate=True)
        return jax.nn.gelu(
            whisper.conv1d(enc["conv2"], h, 2), approximate=True
        )

    def conv2_only(enc, v):
        h = jnp.zeros((v.shape[0], 3000, cfg.d_model), dtype)
        return whisper.conv1d(enc["conv2"], h, 2)

    variants = {
        "stem_conv": jax.jit(lambda p, v: stem_conv(p["encoder"], v, dtype)),
        "stem_mm": jax.jit(lambda p, v: stem_mm(p["encoder"], v, dtype)),
        "stem_mm3": jax.jit(lambda p, v: stem_mm3(p["encoder"], v, dtype)),
        "stem_ncw": jax.jit(lambda p, v: stem_ncw(p["encoder"], v, dtype)),
        "stem_pallas": jax.jit(lambda p, v: conv_stem_pallas(
            p["encoder"]["conv1"], p["encoder"]["conv2"],
            v.astype(dtype),
        )),
        "stem_conv_nogelu": jax.jit(
            lambda p, v: stem_conv_nogelu(p["encoder"], v)
        ),
        "stem_conv_tanhgelu": jax.jit(
            lambda p, v: stem_conv_tanhgelu(p["encoder"], v)
        ),
        "conv2_only": jax.jit(lambda p, v: conv2_only(p["encoder"], v)),
        "encoder": jax.jit(
            lambda p, v: whisper.encode(
                p, cfg, v, compute_dtype=dtype, attn_impl=args.attn
            )
        ),
    }

    # parity check between the two stem formulations
    a = np.asarray(variants["stem_conv"](params, x[:2]), np.float32)
    m = np.asarray(variants["stem_mm"](params, x[:2]), np.float32)
    err = float(np.max(np.abs(a - m)))
    assert err < 0.05, f"stem_mm mismatch: {err}"

    results = {}
    for name, fn in variants.items():
        out = fn(params, x)
        np.asarray(out[-1, -1, -1])  # readback fence (compile + warmup)
        times = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            out = fn(params, x)
            np.asarray(out[-1, -1, -1])
            times.append(time.perf_counter() - t0)
        ms = float(np.min(times)) * 1e3
        rec = {"name": name, "ms": round(ms, 2)}
        if name.startswith("stem"):
            rec["tflops"] = round(stem_flops / (ms / 1e3) / 1e12, 1)
        results[name] = rec
        print(json.dumps(rec), flush=True)

    share = 100 * results["stem_conv"]["ms"] / results["encoder"]["ms"]
    print(json.dumps({
        "stem_share_of_encoder_pct": round(share, 2),
        "stem_mm_vs_conv": round(
            results["stem_conv"]["ms"] / results["stem_mm"]["ms"], 3
        ),
        "mismatch_max": round(err, 4),
        "batch": b,
    }), flush=True)


if __name__ == "__main__":
    main()
