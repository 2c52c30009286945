"""Functional Whisper encoder-decoder on pytree params.

TPU-native re-design of the machinery the reference delegates to HF
`WhisperForConditionalGeneration` (invocation sites run_distillation.py:466-498,
628-649; architecture facts SURVEY.md §2.4): conv1d(k3,s1)+GELU →
conv1d(k3,s2)+GELU stem, fixed sinusoidal encoder positions (1500), pre-LN
transformer blocks, learned decoder positions (448), tied input/output
embedding, k-projection without bias.

Design choices (TPU-first, not a torch translation):
  - Params are plain nested dicts; every transformer layer's weights are
    STACKED on a leading (num_layers,) axis and the block is driven by
    `lax.scan` — one compiled layer body regardless of depth, and
    maximally-spaced student init (create_student_model.py:78-90 semantics)
    becomes a single gather on that axis (models/student_init.py).
  - All shapes static; KV caches are fixed-capacity buffers updated with
    `lax.dynamic_update_slice` so the decode loop jits once.
  - Softmax/LN in fp32, matmuls bf16-in/fp32-accumulate via
    preferred_element_type; `compute_dtype` selects the activation dtype.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from kotoba_whisper_tpu.core.config import WhisperConfig
from kotoba_whisper_tpu.ops.attention import attention

Params = Any  # nested dict pytree


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def sinusoidal_positions(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed encoder position table (log-spaced sinusoids)."""
    assert channels % 2 == 0
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(
        np.float32
    )


def _dense(key, d_in, d_out, bias=True, std=0.02):
    kkey, _ = jax.random.split(key)
    p = {"kernel": jax.random.normal(kkey, (d_in, d_out), jnp.float32) * std}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _attn_params(key, d, *, cross=False):
    ks = jax.random.split(key, 4)
    return {
        "q_proj": _dense(ks[0], d, d),
        "k_proj": _dense(ks[1], d, d, bias=False),  # Whisper: no k bias
        "v_proj": _dense(ks[2], d, d),
        "out_proj": _dense(ks[3], d, d),
    }


def _stack_layers(layer_list):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_list)


def init_params(key: jax.Array, cfg: WhisperConfig) -> Params:
    k = iter(jax.random.split(key, 16 + 4 * (cfg.encoder_layers + cfg.decoder_layers)))
    d = cfg.d_model

    def enc_layer():
        return {
            "self_attn": _attn_params(next(k), d),
            "self_attn_layer_norm": _ln(d),
            "fc1": _dense(next(k), d, cfg.encoder_ffn_dim),
            "fc2": _dense(next(k), cfg.encoder_ffn_dim, d),
            "final_layer_norm": _ln(d),
        }

    def dec_layer():
        return {
            "self_attn": _attn_params(next(k), d),
            "self_attn_layer_norm": _ln(d),
            "encoder_attn": _attn_params(next(k), d, cross=True),
            "encoder_attn_layer_norm": _ln(d),
            "fc1": _dense(next(k), d, cfg.decoder_ffn_dim),
            "fc2": _dense(next(k), cfg.decoder_ffn_dim, d),
            "final_layer_norm": _ln(d),
        }

    encoder = {
        "conv1": {
            "kernel": jax.random.normal(next(k), (3, cfg.num_mel_bins, d)) * 0.02,
            "bias": jnp.zeros((d,)),
        },
        "conv2": {
            "kernel": jax.random.normal(next(k), (3, d, d)) * 0.02,
            "bias": jnp.zeros((d,)),
        },
        "pos_embedding": jnp.asarray(
            sinusoidal_positions(cfg.max_source_positions, d)
        ),
        "layers": _stack_layers([enc_layer() for _ in range(cfg.encoder_layers)]),
        "layer_norm": _ln(d),
    }
    decoder = {
        "embed_tokens": {
            "embedding": jax.random.normal(next(k), (cfg.vocab_size, d)) * 0.02
        },
        "pos_embedding": jax.random.normal(next(k), (cfg.max_target_positions, d))
        * 0.02,
        "layers": _stack_layers([dec_layer() for _ in range(cfg.decoder_layers)]),
        "layer_norm": _ln(d),
    }
    return {"encoder": encoder, "decoder": decoder}


def param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------

def layer_norm(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def dense(p, x):
    if "kernel_q" in p:  # w8a8 int8 projection (models/quantized.py)
        from kotoba_whisper_tpu.models.quantized import dense_int8

        return dense_int8(p, x)
    y = jnp.einsum("...i,io->...o", x, p["kernel"].astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def split_heads(x, n_heads):
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads)


def merge_heads(x):
    b, t, h, hd = x.shape
    return x.reshape(b, t, h * hd)


def qkv_projections(p, x, kv_x, n_heads):
    """(q, k, v) head-split projections; consumes fused qkv/kv entries when
    present (models/optimized.py)."""
    if "qkv_proj" in p:  # self-attention fused path (x is kv_x)
        qkv = dense(p["qkv_proj"], x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    elif "kv_proj" in p:  # cross-attention fused path
        q = dense(p["q_proj"], x)
        kv = dense(p["kv_proj"], kv_x)
        k, v = jnp.split(kv, 2, axis=-1)
    else:
        q = dense(p["q_proj"], x)
        k = dense(p["k_proj"], kv_x)
        v = dense(p["v_proj"], kv_x)
    return (
        split_heads(q, n_heads),
        split_heads(k, n_heads),
        split_heads(v, n_heads),
    )


def mha(p, x, kv_x, n_heads, *, mask=None, causal=False, impl="xla"):
    q, k, v = qkv_projections(p, x, kv_x, n_heads)
    o = attention(q, k, v, mask, causal=causal, impl=impl)
    return dense(p["out_proj"], merge_heads(o))


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def conv1d(p, x, stride):
    """x: (B, T, C_in), kernel (K, C_in, C_out), SAME-ish padding=1 (K=3)."""
    return jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride,),
        padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + p["bias"].astype(x.dtype)


def encode(
    params: Params,
    cfg: WhisperConfig,
    input_features: jax.Array,
    *,
    compute_dtype=jnp.float32,
    attn_impl: str = "xla",
    remat: bool = False,
    stem_impl: str = "xla",
) -> jax.Array:
    """(B, n_mels, 3000) log-mel -> (B, 1500, d) encoder states.

    stem_impl: "xla" (default) or "pallas" (ops/conv_stem.py fused
    kernel). Measured A/B at B=48 large-v3 (tools/stem_exp.py): 32.6 ms
    Pallas vs 33.2 ms XLA — a wash; both run at the same ~26 TFLOP/s
    shape-bound rate, so XLA conv stays the default and the kernel is
    kept as the documented opt-in (SURVEY §2.2 stem-kernel row, retired
    with data)."""
    enc = params["encoder"]
    if stem_impl == "pallas":
        from kotoba_whisper_tpu.ops.conv_stem import conv_stem_pallas

        x = conv_stem_pallas(
            enc["conv1"], enc["conv2"],
            input_features.astype(compute_dtype),
            interpret=jax.default_backend() != "tpu",
        )
    else:
        x = jnp.transpose(input_features, (0, 2, 1)).astype(compute_dtype)
        x = jax.nn.gelu(conv1d(enc["conv1"], x, 1), approximate=False)
        x = jax.nn.gelu(conv1d(enc["conv2"], x, 2), approximate=False)
    x = x + enc["pos_embedding"].astype(compute_dtype)[None]

    n_heads = cfg.encoder_attention_heads

    def block(x, lp):
        h = layer_norm(lp["self_attn_layer_norm"], x, cfg.layer_norm_eps)
        x = x + mha(lp["self_attn"], h, h, n_heads, impl=attn_impl)
        h = layer_norm(lp["final_layer_norm"], x, cfg.layer_norm_eps)
        h = jax.nn.gelu(dense(lp["fc1"], h), approximate=False)
        x = x + dense(lp["fc2"], h)
        return x, None

    if remat:
        block = jax.checkpoint(block)
    x, _ = jax.lax.scan(block, x, enc["layers"])
    return layer_norm(enc["layer_norm"], x, cfg.layer_norm_eps)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class KVCache(NamedTuple):
    """Fixed-capacity decoder cache, layers stacked on axis 0.

    K/V are stored FLAT: self_k/self_v (L, B, capacity, D); cross_k/cross_v
    precomputed from encoder states once per utterance (L, B, 1500, D).
    Flat (lane-packed) layout matters: with per-head minor dims (H=20,
    hd=64) XLA pads to sublane/lane tiles and nearly doubles the HBM
    footprint AND the per-step read traffic of the cross cache — the
    dominant cost of incremental decode (measured via xprof; see
    ops/decode_attention.py). length: current fill (lockstep batch).

    Optional int8 mode (kv_dtype="int8"): K/V stored int8 with per-row
    absmax scales (L, B, T, 1) fp32 — halves the decode loop's dominant
    HBM traffic; scales fold losslessly into the block-diagonal attention
    (scores *= k_scale, weights *= v_scale before the V reduce).

    Optional int4 mode (kv_dtype="int4"): cross K/V stored int4 with
    per-(row, head) absmax scales (L, B, T, H) bf16 — halves cross-KV
    traffic again vs int8. The 64-element scale groups are exact in the
    block-diagonal attention: qd is block-diagonal over heads, so each
    score/weight element mixes exactly one head's block and the per-head
    scale folds without approximation (only the 4-bit rounding is lossy).
    Self K/V stay int8 (same per-head scale shape) — their traffic is
    minor and self-attention feeds back into the cache each step.
    """

    self_k: jax.Array
    self_v: jax.Array
    cross_k: jax.Array
    cross_v: jax.Array
    length: jax.Array
    self_k_scale: jax.Array | None = None
    self_v_scale: jax.Array | None = None
    cross_k_scale: jax.Array | None = None
    cross_v_scale: jax.Array | None = None

    @property
    def is_quantized(self) -> bool:
        return self.cross_k_scale is not None

    # back-compat alias (pre-int4 name)
    is_int8 = is_quantized

    @property
    def per_head_scales(self) -> bool:
        # Per-head (int4-style) scale buffers are bf16; per-row (int8)
        # scales are fp32. Dtype is the reliable discriminator — shape[-1]
        # would misclassify a 1-head decoder's per-head cache as per-row.
        return self.is_quantized and self.cross_k_scale.dtype == jnp.bfloat16


def quantize_kv_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., T, D) -> (int8 values, fp32 per-row scale (..., T, 1))."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_kv_heads(
    x: jax.Array, n_heads: int, dtype=jnp.int4
) -> tuple[jax.Array, jax.Array]:
    """(..., T, D) -> (int values flat (..., T, D), bf16 scales (..., T, H)).

    Absmax scale per (row, head): each scale group is one head's 64-dim
    block, which the block-diagonal decode attention folds exactly
    (see KVCache docstring / ops/decode_attention.py)."""
    qmax = 7.0 if dtype == jnp.int4 else 127.0
    *lead, t, d = x.shape
    xs = x.astype(jnp.float32).reshape(*lead, t, n_heads, d // n_heads)
    amax = jnp.max(jnp.abs(xs), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / qmax
    # Round the scale through bf16 FIRST and quantize against the rounded
    # value — the stored (bf16) scale is then exactly the one used for
    # quantization, so only the k-bit rounding itself is lossy.
    scale = scale.astype(jnp.bfloat16).astype(jnp.float32)
    q = jnp.clip(jnp.round(xs / scale), -qmax, qmax)
    return (
        q.astype(dtype).reshape(*lead, t, d),
        scale[..., 0].astype(jnp.bfloat16),
    )


def init_cache(
    params: Params,
    cfg: WhisperConfig,
    encoder_out: jax.Array,
    capacity: int,
    *,
    compute_dtype=jnp.float32,
    kv_dtype: str = "compute",  # "compute" | "int8" | "int4"
    beam_size: int = 1,
) -> KVCache:
    """beam_size > 1: encoder_out holds one row per beam GROUP; the
    cross-KV projections are computed and stored once per group (they are
    hypothesis-independent) while the self-KV buffers get group*beam
    rows. Beam decode's dominant HBM cost is streaming the cross-KV every
    step — sharing it across beams divides that traffic (and the cache
    footprint) by num_beams; decode() fans the per-beam queries over the
    shared rows (beam_size arg)."""
    dec = params["decoder"]
    b = encoder_out.shape[0]
    b_rows = b * beam_size

    def cross_kv(lp):
        ea = lp["encoder_attn"]
        if "kv_proj" in ea:
            kv = dense(ea["kv_proj"], encoder_out)
            k_flat, v_flat = jnp.split(kv, 2, axis=-1)
        else:
            k_flat = dense(ea["k_proj"], encoder_out)
            v_flat = dense(ea["v_proj"], encoder_out)
        return k_flat, v_flat

    # Size-gate the per-layer serialization of the cross-KV projection:
    # an all-layers vmap materializes the full-precision kv_proj output
    # of every layer at once (bf16 (L,B,1500,2*D) — >11 GB at L=32,
    # B=48; 6.9 GB at B=30), which compile-OOMs a 16 GB v5e, while
    # lax.map costs ~100 ms extra init latency at small batch (measured
    # pre/post A/B on the speed table). Large temps serialize; small
    # batches keep the fused vmap. Init runs once per batch, off the
    # decode hot loop.
    # The quantized paths upcast the per-layer kv_proj output to fp32
    # inside quantize_kv_heads/quantize_kv_rows, so their real temp is
    # the fp32 itemsize regardless of compute_dtype — estimating with
    # bf16 would let a batch just under the threshold pick the fused
    # vmap with ~2x the budgeted temp (ADVICE r4).
    temp_itemsize = (
        4 if kv_dtype in ("int4", "int8")
        else jnp.dtype(compute_dtype).itemsize
    )
    temp_bytes = (
        cfg.decoder_layers * b * encoder_out.shape[1] * 2 * cfg.d_model
        * temp_itemsize
    )
    layer_map = jax.lax.map if temp_bytes > 2 << 30 else (
        lambda f, xs: jax.vmap(f)(xs)
    )

    if kv_dtype in ("int4", "int8"):
        l, h = cfg.decoder_layers, cfg.decoder_attention_heads

        def cross_kv_q(lp):
            k_flat, v_flat = cross_kv(lp)
            if kv_dtype == "int4":
                return (
                    *quantize_kv_heads(k_flat, h, jnp.int4),
                    *quantize_kv_heads(v_flat, h, jnp.int4),
                )
            return (*quantize_kv_rows(k_flat), *quantize_kv_rows(v_flat))

        cross_k, ck_s, cross_v, cv_s = layer_map(cross_kv_q, dec["layers"])
        scale_w = h if kv_dtype == "int4" else 1
        scale_dt = jnp.bfloat16 if kv_dtype == "int4" else jnp.float32
        zeros = jnp.zeros((l, b_rows, capacity, cfg.d_model), jnp.int8)
        zscale = jnp.ones((l, b_rows, capacity, scale_w), scale_dt)
        return KVCache(
            zeros, zeros, cross_k, cross_v, jnp.zeros((), jnp.int32),
            zscale, zscale, ck_s, cv_s,
        )
    cross_k, cross_v = layer_map(cross_kv, dec["layers"])
    zeros = jnp.zeros(
        (cfg.decoder_layers, b_rows, capacity, cfg.d_model), compute_dtype
    )
    return KVCache(
        zeros, zeros,
        cross_k.astype(compute_dtype), cross_v.astype(compute_dtype),
        jnp.zeros((), jnp.int32),
    )


def decode(
    params: Params,
    cfg: WhisperConfig,
    input_ids: jax.Array,
    encoder_out: jax.Array | None = None,
    cache: KVCache | None = None,
    *,
    compute_dtype=jnp.float32,
    attn_impl: str = "xla",
    remat: bool = False,
    ring_pos: jax.Array | None = None,
    beam_size: int = 1,
):
    """Decoder forward.

    Training/prefill mode (cache=None): full causal self-attention over
    input_ids (B, T) against encoder_out; returns logits (B, T, vocab).

    Incremental mode (cache given): input_ids is the next token block
    (B, T_new); self-attention attends to cache[0:length+T_new]; returns
    (logits, updated_cache).

    cache.length may be a scalar (lockstep batch — every row at the same
    position) or a (B,) vector (continuous-batching decode, where refilled
    rows sit at different positions; decode/streaming.py). The vector form
    supports single-token steps only (t == 1): positions are per-row
    gathers, and KV writes are either per-row scatters (ring_pos=None) or,
    with `ring_pos` given, one dynamic_update_slice at the SHARED ring
    slot: all rows write slot ring_pos regardless of their own sequence
    position, and self-attention selects each row's last `count` ring
    slots via a cyclic-age mask ((ring_pos - slot) mod capacity < count).
    Attention is permutation-invariant given the mask and Whisper carries
    position only in the learned embedding, so the scrambled slot order is
    exact — while the write stays the same cheap lockstep-style slice
    update instead of a per-row scatter (measured on-chip via
    tools/stream_exp.py). Rows must not live longer than `capacity` steps
    (guaranteed: max_length == capacity total tokens per row).

    beam_size > 1 (with a cache built by init_cache(beam_size=...)): the
    input rows are beam-major groups (B*beam, ...) but the cache's
    cross-KV holds ONE row per group. Cross-attention fans each group's
    `beam_size` queries over the shared KV rows in a single attention
    call — the cross-KV HBM stream (the dominant beam decode cost) and
    the cache footprint are divided by beam_size, and the per-step beam
    reorder never has to touch cross-KV at all.
    """
    dec = params["decoder"]
    n_heads = cfg.decoder_attention_heads
    b, t = input_ids.shape
    row_lengths = (
        cache is not None and getattr(cache.length, "ndim", 0) == 1
    )
    assert not (row_lengths and t != 1), "per-row lengths need t == 1"
    ring = ring_pos is not None
    assert not (ring and not row_lengths), "ring_pos needs per-row lengths"

    x = dec["embed_tokens"]["embedding"].astype(compute_dtype)[input_ids]
    if row_lengths:
        positions = jnp.take(
            dec["pos_embedding"].astype(compute_dtype), cache.length, axis=0
        )[:, None]  # (B, 1, D)
        x = x + positions
    else:
        pos0 = cache.length if cache is not None else 0
        positions = jax.lax.dynamic_slice_in_dim(
            dec["pos_embedding"].astype(compute_dtype), pos0, t, axis=0
        )
        x = x + positions[None]

    if cache is None:
        assert encoder_out is not None

        def block(x, lp):
            h = layer_norm(lp["self_attn_layer_norm"], x, cfg.layer_norm_eps)
            x = x + mha(lp["self_attn"], h, h, n_heads, causal=True, impl=attn_impl)
            h = layer_norm(lp["encoder_attn_layer_norm"], x, cfg.layer_norm_eps)
            x = x + mha(
                lp["encoder_attn"], h, encoder_out.astype(compute_dtype),
                n_heads, impl=attn_impl,
            )
            h = layer_norm(lp["final_layer_norm"], x, cfg.layer_norm_eps)
            h = jax.nn.gelu(dense(lp["fc1"], h), approximate=False)
            x = x + dense(lp["fc2"], h)
            return x, None

        if remat:
            block = jax.checkpoint(block)
        x, _ = jax.lax.scan(block, x, dec["layers"])
        x = layer_norm(dec["layer_norm"], x, cfg.layer_norm_eps)
        logits = jnp.einsum(
            "btd,vd->btv", x,
            dec["embed_tokens"]["embedding"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return logits

    # ---- incremental decode with fixed-capacity FLAT cache ----
    from kotoba_whisper_tpu.ops.decode_attention import (
        decode_attention_flat,
        decode_attention_reference,
    )

    capacity = cache.self_k.shape[2]
    # Decode-step attention default is the block-diagonal XLA path: on-chip
    # A/B at large-v3 shapes it beats the chunked Pallas kernel (482 vs 288
    # audio-s/s/chip at B=32 — XLA's batched skinny matmuls pipeline the KV
    # streaming better than the per-row grid). The kernel stays available
    # via attn_impl="pallas_decode" for future tuning.
    use_flat_kernel = t == 1 and attn_impl == "pallas_decode"
    if t > 1:
        # prefill: token i (global pos length+i) attends to slots
        # 0..length+i — causal within the block, full over history
        kv_mask = (
            jnp.arange(capacity)[None, :]
            <= cache.length + jnp.arange(t)[:, None]
        )[None, None]  # (1, 1, t, capacity)

    int8_kv = cache.is_quantized
    per_head = cache.per_head_scales

    def flat_or_ref(q_flat, k_flat, v_flat, valid, k_scale=None, v_scale=None,
                    ring_slot=None):
        """Single-query attention over a flat KV block."""
        b_, _, d_ = q_flat.shape
        q3 = q_flat.reshape(b_, n_heads, d_ // n_heads)
        if use_flat_kernel and k_scale is None and ring_slot is None:
            o = decode_attention_flat(q3, k_flat, v_flat, valid, n_heads=n_heads)
        else:
            o = decode_attention_reference(
                q3, k_flat, v_flat, valid, n_heads=n_heads,
                k_scale=k_scale, v_scale=v_scale, ring_pos=ring_slot,
            )
        return o.reshape(b_, 1, d_)

    def quantize_new(x):
        if per_head:
            return quantize_kv_heads(x, n_heads, jnp.int8)
        return quantize_kv_rows(x)

    def dequant(vals, scale):
        v = vals.astype(jnp.float32)
        if scale.shape[-1] > 1:  # per-head scale groups
            b_, t_, d_ = v.shape
            v = v.reshape(b_, t_, scale.shape[-1], -1)
            v = v * scale[..., None].astype(jnp.float32)
            return v.reshape(b_, t_, d_).astype(compute_dtype)
        return (v * scale).astype(compute_dtype)

    def cache_write(buf, new, start):
        """Write (B, t, *) `new` at time offset(s) `start` into (B, cap, *):
        one dynamic_update_slice when the batch is lockstep (scalar start)
        or in ring mode (shared ring slot), a per-row scatter when rows sit
        at different physical positions (legacy streaming layout)."""
        new = new.astype(buf.dtype)
        if ring:
            return jax.lax.dynamic_update_slice_in_dim(
                buf, new, ring_pos, axis=1
            )
        if row_lengths:
            return buf.at[jnp.arange(b), start].set(new[:, 0])
        return jax.lax.dynamic_update_slice_in_dim(buf, new, start, axis=1)

    def block(x, layer_in):
        (lp, self_k, self_v, cross_k, cross_v,
         sk_s, sv_s, ck_s, cv_s) = layer_in
        h = layer_norm(lp["self_attn_layer_norm"], x, cfg.layer_norm_eps)
        if "qkv_proj" in lp["self_attn"]:
            qkv = dense(lp["self_attn"]["qkv_proj"], h)
            q_flat, k_new, v_new = jnp.split(qkv, 3, axis=-1)
        else:
            q_flat = dense(lp["self_attn"]["q_proj"], h)
            k_new = dense(lp["self_attn"]["k_proj"], h)
            v_new = dense(lp["self_attn"]["v_proj"], h)
        if int8_kv:
            k_new, k_new_s = quantize_new(k_new)
            v_new, v_new_s = quantize_new(v_new)
            sk_s = cache_write(sk_s, k_new_s, cache.length)
            sv_s = cache_write(sv_s, v_new_s, cache.length)
        self_k = cache_write(self_k, k_new, cache.length)
        self_v = cache_write(self_v, v_new, cache.length)
        if t == 1:
            o_flat = flat_or_ref(
                q_flat, self_k, self_v, cache.length + 1,
                k_scale=sk_s if int8_kv else None,
                v_scale=sv_s if int8_kv else None,
                ring_slot=ring_pos if ring else None,
            )
        else:
            sk = dequant(self_k, sk_s) if int8_kv else self_k
            sv = dequant(self_v, sv_s) if int8_kv else self_v
            o = attention(
                split_heads(q_flat, n_heads),
                split_heads(sk, n_heads),
                split_heads(sv, n_heads),
                kv_mask,
            )
            o_flat = merge_heads(o)
        x = x + dense(lp["self_attn"]["out_proj"], o_flat)

        h = layer_norm(lp["encoder_attn_layer_norm"], x, cfg.layer_norm_eps)
        q_flat = dense(lp["encoder_attn"]["q_proj"], h)
        if beam_size > 1 and t == 1:
            # shared cross-KV decode step: the group's K beam queries
            # attend ONE KV row, read once (1/K the HBM stream of the
            # replicated layout); int8/int4 scales fold in-place — see
            # decode_attention_reference_beam
            from kotoba_whisper_tpu.ops.decode_attention import (
                decode_attention_reference_beam,
            )

            bg = b // beam_size
            d_ = q_flat.shape[-1]
            q4 = q_flat.reshape(bg, beam_size, n_heads, d_ // n_heads)
            o4 = decode_attention_reference_beam(
                q4, cross_k, cross_v, n_heads=n_heads,
                k_scale=ck_s if int8_kv else None,
                v_scale=cv_s if int8_kv else None,
            )
            o_flat = o4.reshape(b, 1, d_)
        elif beam_size > 1:
            # shared cross-KV prompt prefill: (B*K, t, D) queries
            # regrouped to (B, K*t, D) attend the group's single KV row —
            # cross-attn has no mask, so fanning beams and prefill
            # positions into the query axis is exact (one-shot pass;
            # materializing the dequantized KV here is fine)
            bg = b // beam_size
            ck = dequant(cross_k, ck_s) if int8_kv else cross_k
            cv = dequant(cross_v, cv_s) if int8_kv else cross_v
            qg = q_flat.reshape(bg, beam_size * t, q_flat.shape[-1])
            o = attention(
                split_heads(qg, n_heads),
                split_heads(ck, n_heads),
                split_heads(cv, n_heads),
            )
            o_flat = merge_heads(o).reshape(b, t, q_flat.shape[-1])
        elif t == 1:
            o_flat = flat_or_ref(
                q_flat, cross_k, cross_v,
                jnp.asarray(cross_k.shape[1], jnp.int32),
                k_scale=ck_s if int8_kv else None,
                v_scale=cv_s if int8_kv else None,
            )
        else:
            ck = dequant(cross_k, ck_s) if int8_kv else cross_k
            cv = dequant(cross_v, cv_s) if int8_kv else cross_v
            o = attention(
                split_heads(q_flat, n_heads),
                split_heads(ck, n_heads),
                split_heads(cv, n_heads),
            )
            o_flat = merge_heads(o)
        x = x + dense(lp["encoder_attn"]["out_proj"], o_flat)

        h = layer_norm(lp["final_layer_norm"], x, cfg.layer_norm_eps)
        h = jax.nn.gelu(dense(lp["fc1"], h), approximate=False)
        x = x + dense(lp["fc2"], h)
        return x, (self_k, self_v, sk_s, sv_s)

    ones = jnp.ones((cfg.decoder_layers, b, 1, 1), jnp.float32)
    scan_in = (
        dec["layers"], cache.self_k, cache.self_v,
        cache.cross_k, cache.cross_v,
        cache.self_k_scale if int8_kv else ones,
        cache.self_v_scale if int8_kv else ones,
        cache.cross_k_scale if int8_kv else ones,
        cache.cross_v_scale if int8_kv else ones,
    )
    x, (new_k, new_v, new_sk_s, new_sv_s) = jax.lax.scan(block, x, scan_in)
    x = layer_norm(dec["layer_norm"], x, cfg.layer_norm_eps)
    logits = jnp.einsum(
        "btd,vd->btv", x,
        dec["embed_tokens"]["embedding"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    new_cache = KVCache(
        new_k, new_v, cache.cross_k, cache.cross_v, cache.length + t,
        new_sk_s if int8_kv else None,
        new_sv_s if int8_kv else None,
        cache.cross_k_scale, cache.cross_v_scale,
    )
    return logits, new_cache


# ---------------------------------------------------------------------------
# Full forward + CE loss (reference: HF forward(labels=...) with -100 mask)
# ---------------------------------------------------------------------------

def forward(
    params: Params,
    cfg: WhisperConfig,
    input_features: jax.Array,
    decoder_input_ids: jax.Array,
    *,
    encoder_out: jax.Array | None = None,
    compute_dtype=jnp.float32,
    attn_impl: str = "xla",
    remat: bool = False,
):
    """Returns (logits, encoder_out)."""
    if encoder_out is None:
        encoder_out = encode(
            params, cfg, input_features,
            compute_dtype=compute_dtype, attn_impl=attn_impl, remat=remat,
        )
    logits = decode(
        params, cfg, decoder_input_ids, encoder_out,
        compute_dtype=compute_dtype, attn_impl=attn_impl, remat=remat,
    )
    return logits, encoder_out


def ce_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Token-mean cross-entropy with -100 ignore mask (HF semantics,
    run_distillation.py:628-639)."""
    mask = labels != -100
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def shift_labels_right(
    labels: jax.Array, decoder_start: int, pad_id: int = 50256
) -> jax.Array:
    """labels (with -100 pads) -> decoder_input_ids (collator semantics,
    run_distillation.py:254-271): prepend start token, drop last, replace
    -100 with pad so embeds are valid (the positions are loss-masked)."""
    shifted = jnp.concatenate(
        [jnp.full((labels.shape[0], 1), decoder_start, labels.dtype), labels[:, :-1]],
        axis=1,
    )
    return jnp.where(shifted == -100, pad_id, shifted)
