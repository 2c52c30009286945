"""int8 (w8a8) quantized inference for the dense projections.

TPU-native throughput lever with no reference-stack counterpart (the
reference serves the teacher in bf16, run_pseudo_labelling.py:224-231): the
v5e MXU executes s8xs8->s32 matmuls at twice the bf16 rate, and the
encoder's GEMMs already run at ~92% of the calibrated bf16 ceiling
(docs/DESIGN.md), so halving the MXU time of the projections is the one
remaining large lever on the encoder pass. Measured end to end it lifts
the fixed-48 pseudo-label pipeline 725 -> 787 audio-s/s/chip; the win
lands mostly in the encoder GEMMs — the decode-step ablation
(tools/dec_exp.py) shows the decoder's per-step weight streaming is
largely overlapped by XLA at B=48 (docs/DESIGN.md round-4 attribution).

Scheme (per dense projection y = x @ W + b):
  - weights:  static per-out-channel absmax int8 — W_q[i, o] with
    fp32 scale s_w[o]; quantized once by `quantize_for_inference`,
    `dense` consumes the quantized form directly.
  - activations: dynamic per-row absmax int8 — computed on the VPU at
    run time (a negligible elementwise pass next to the GEMM savings).
  - accumulation: s32 on the MXU (preferred_element_type), dequantized as
    y = (x_q @ W_q) * s_x[row] * s_w[col] + b in fp32, then cast back to
    the compute dtype.

Like the KV-cache quantization (`kv_dtype=`), this is strictly OPT-IN: it
changes teacher outputs, so pseudo-label quality must be validated by the
operator (cli/parity_check.py measures token agreement on real weights).
LayerNorms, the attention core, the conv stem, embeddings and the logits
projection stay in the compute dtype — only the seven per-layer dense
projections (qkv/out/fc1/fc2, cross q/kv) are quantized.

The transform composes with `fuse_for_inference` (models/optimized.py);
apply fusion first so the fused qkv/kv kernels are quantized as one.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

# dense params eligible for quantization (keys inside each layer dict)
_DENSE_KEYS = (
    "q_proj", "k_proj", "v_proj", "qkv_proj", "kv_proj", "out_proj",
    "fc1", "fc2",
)


def quantize_dense_int8(p: dict) -> dict:
    """{kernel (..., in, out), bias?} -> {kernel_q int8, kernel_scale fp32
    (..., out), bias?}. Per-out-channel absmax over the contraction axis."""
    k = p["kernel"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    out = {"kernel_q": q, "kernel_scale": scale[..., 0, :]}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def dense_int8(p: dict, x: jax.Array) -> jax.Array:
    """w8a8 dense: dynamic per-row activation quantization, s32 MXU dot.

    The quantize pipeline is written so XLA fuses it into two passes over
    the activation (one absmax reduce, one mul+round+clip+convert) without
    materializing an fp32 copy of x: the row statistic is computed via
    abs/max on the input dtype (exact — absmax of bf16 values IS a bf16
    value), only the inverse scale is fp32. A/B on-chip showed the earlier
    fp32-upcast-first version gave ZERO net encoder win at B=48 (1279 vs
    1287 ms bf16) — the fp32 materialization ate the 1.86x MXU rate
    (tools/matmul_cal.py --dtype int8: 309.6 vs 166.7 TFLOP/s)."""
    a = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    s_x = jnp.maximum(a, 1e-8) * (1.0 / 127.0)
    inv = (1.0 / s_x)
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) * inv), -127, 127
    ).astype(jnp.int8)
    y = jnp.einsum(
        "...i,io->...o", xq, p["kernel_q"],
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * s_x * p["kernel_scale"].astype(jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _quantize_layers(layers: dict) -> dict:
    out = dict(layers)
    for name, sub in layers.items():
        if not isinstance(sub, dict):
            continue
        if "kernel" in sub and name in _DENSE_KEYS:
            out[name] = quantize_dense_int8(sub)
        elif any(isinstance(v, dict) for v in sub.values()):
            out[name] = _quantize_layers(sub)
    return out


def quantize_for_inference(
    params: Any, parts: tuple[str, ...] = ("encoder", "decoder")
) -> Any:
    """Quantize the dense projections of the named parts to w8-int8.

    Works on both fused (models/optimized.py) and unfused layouts; the
    scan-stacked (L, in, out) kernels quantize per (layer, out-channel).
    """
    out = dict(params)
    for part in parts:
        sub = dict(params[part])
        sub["layers"] = _quantize_layers(params[part]["layers"])
        out[part] = sub
    return out
