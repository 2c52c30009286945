"""Decode-step attention over flat (lane-packed) KV caches.

Why (found via xprof on the real chip): incremental decode re-reads the
whole cross-attention K/V every step — for large-v3, 32 layers x 2 tensors
x (B, 1500, 20 heads, 64) per token. With heads as separate minor dims,
XLA pads the last dim 64 -> 128 lanes and the head dim to sublanes,
~2.4x-ing both the HBM footprint (caps feasible batch) and the per-step
read traffic. The caches therefore store K/V flat (B, T, H*64) — exactly
lane-packed — and attention must be computed WITHOUT reshaping back to
per-head layout (a reshape would materialize the padded form again).

The head structure is recovered with block-diagonal projections instead:

    scores[b,t,h] = sum_d k[b,t,d] * qd[b,d,h]      qd = q ⊙ blockdiag
    w_exp[b,t,d]  = sum_h w[b,t,h] * E[h,d]         E[h, h*64:(h+1)*64]=1
    out[b,d]      = sum_t w_exp[b,t,d] * v[b,t,d]

i.e. two skinny MXU matmuls and an elementwise reduce — no transposes, no
reshapes, identical math to per-head softmax(qK^T/√d)V. The XLA path uses
these einsums directly; the Pallas kernel streams K/V chunks HBM->VMEM
with flash-style online normalization for minimal traffic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30
DEFAULT_CHUNK = 512


@functools.lru_cache(maxsize=8)
def _expand_matrix(n_heads: int, head_dim: int) -> np.ndarray:
    """E (H, H*hd): E[h, h*hd + i] = 1 — head -> flat-lane broadcast."""
    e = np.zeros((n_heads, n_heads * head_dim), np.float32)
    for h in range(n_heads):
        e[h, h * head_dim : (h + 1) * head_dim] = 1.0
    return e


def _qd(q: jax.Array, n_heads: int) -> jax.Array:
    """q (B, H, hd) -> block-diagonal qd (B, H*hd, H), scaled by 1/√hd."""
    b, h, hd = q.shape
    e = jnp.asarray(_expand_matrix(h, hd))          # (H, dh)
    q_flat = q.reshape(b, h * hd) * (1.0 / hd**0.5)
    # qd[b, d, g] = q_flat[b, d] * E[g, d]
    return q_flat[:, :, None] * e.T[None]


# ---------------------------------------------------------------------------
# XLA path
# ---------------------------------------------------------------------------

def decode_attention_reference(
    q, k_flat, v_flat, valid_len, *, n_heads,
    k_scale=None, v_scale=None, ring_pos=None,
):
    """(B,H,hd) x (B,T,dh) -> (B,H,hd); everything on the flat layout.

    With k_scale/v_scale given, K/V are int-quantized and the scales fold
    into the score and weight tensors (exact algebra — the only
    approximation is the quantization itself). Scale shapes: (B,T,1) for
    per-row groups (int8 mode), or (B,T,H) for per-head 64-dim groups
    (int4 mode) — per-head folding is exact because qd is block-diagonal,
    so scores[b,t,h] only mixes head h's block of k, and w_exp expands
    w[b,t,h] back onto exactly that block of v.

    valid_len: scalar (lockstep batch) or (B,) per-row counts (continuous-
    batching decode, where refilled rows sit at different positions).

    ring_pos: with the shared-slot ring cache (models/whisper.py decode
    ring mode) each row's valid keys are the `valid_len` ring slots most
    recently written, ending at slot ring_pos — mask by cyclic age
    ((ring_pos - slot) mod T < valid) instead of position."""
    b, t, dh = k_flat.shape
    hd = dh // n_heads
    e = jnp.asarray(_expand_matrix(n_heads, hd))
    qd = _qd(q.astype(jnp.float32), n_heads)        # (B, dh, H)
    int_kv = jnp.issubdtype(k_flat.dtype, jnp.integer)
    kf = k_flat.astype(jnp.bfloat16) if int_kv else k_flat
    scores = jnp.einsum(
        "btd,bdh->bth", kf.astype(jnp.float32), qd,
        preferred_element_type=jnp.float32,
    )
    if k_scale is not None:
        scores = scores * k_scale.astype(jnp.float32)
    valid = jnp.asarray(valid_len)
    if valid.ndim == 1:
        valid = valid[:, None, None]                # (B, 1, 1) per-row
    pos = jnp.arange(t)[None, :, None]
    if ring_pos is not None:
        age = jnp.mod(ring_pos - pos, t)            # 0 = just written
        mask = age < valid
    else:
        mask = pos < valid
    scores = jnp.where(mask, scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=1)              # softmax over T
    if v_scale is not None:
        w = w * v_scale.astype(jnp.float32)
    w_exp = jnp.einsum(
        "bth,hd->btd", w, e, preferred_element_type=jnp.float32
    )
    vf = v_flat.astype(jnp.bfloat16) if int_kv else v_flat
    out = jnp.sum(w_exp * vf.astype(jnp.float32), axis=1)  # (B, dh)
    out_dtype = q.dtype
    return out.reshape(b, n_heads, hd).astype(out_dtype)


def decode_attention_reference_beam(
    q, k_flat, v_flat, *, n_heads, k_scale=None, v_scale=None,
):
    """Shared-KV multi-query (beam) decode attention.

    q (B, K, H, hd) — K beam queries per group — against ONE flat KV row
    per group (B, T, dh), read once. Same block-diagonal two-skinny-
    matmul scheme as decode_attention_reference with the beam axis folded
    into the score columns: identical FLOPs to K independent rows
    (scores cost B·T·dh·(K·H) either way) but 1/K the KV HBM traffic —
    the dominant beam-decode cost. Int K/V with k_scale/v_scale
    ((B,T,1) per-row or (B,T,H) per-head) folds exactly, reading the
    int8/int4 buffers directly (no dequantized HBM temp — the naive
    dequant-then-attend form let XLA materialize bf16 copies of the
    whole cross cache per step, measured 2x slower end-to-end).
    Cross-attention only: every slot valid, no mask/ring.
    Returns (B, K, H, hd)."""
    b, kbeams, h, hd = q.shape
    t = k_flat.shape[1]
    e = jnp.asarray(_expand_matrix(h, hd))          # (H, dh)
    int_kv = jnp.issubdtype(k_flat.dtype, jnp.integer)
    kf = k_flat.astype(jnp.bfloat16) if int_kv else k_flat
    q_flat = (
        q.reshape(b, kbeams, h * hd).astype(jnp.float32) * (1.0 / hd**0.5)
    )
    # qd[b, d, (j, g)] = q_flat[b, j, d] * E[g, d]
    qd = q_flat.transpose(0, 2, 1)[:, :, :, None] * e.T[None, :, None, :]
    qd = qd.reshape(b, h * hd, kbeams * h)
    scores = jnp.einsum(
        "btd,bdc->btc", kf.astype(jnp.float32), qd,
        preferred_element_type=jnp.float32,
    ).reshape(b, t, kbeams, h)
    if k_scale is not None:
        scores = scores * k_scale.astype(jnp.float32)[:, :, None, :]
    w = jax.nn.softmax(scores, axis=1)              # softmax over T
    if v_scale is not None:
        w = w * v_scale.astype(jnp.float32)[:, :, None, :]
    vf = v_flat.astype(jnp.bfloat16) if int_kv else v_flat
    wv = jnp.einsum(
        "btkh,btd->bkhd", w, vf.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    # head g's weights only touch head g's block of v
    out = jnp.einsum("bkhd,hd->bkd", wv, e)
    return out.reshape(b, kbeams, h, hd).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel: chunked streaming with online softmax
# ---------------------------------------------------------------------------

def _kernel(
    valid_len_ref,
    qd_ref,     # (dh, H)
    e_ref,      # (H, dh) constant expand matrix
    k_ref,      # (CHUNK, dh)
    v_ref,      # (CHUNK, dh)
    o_ref,      # (1, dh)
    m_ref,      # scratch (1, H)
    l_ref,      # scratch (1, H)
    acc_ref,    # scratch (1, dh)
    *,
    chunk: int,
):
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    valid = valid_len_ref[pl.program_id(0)]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k = k_ref[:].astype(jnp.float32)                # (C, dh)
    v = v_ref[:].astype(jnp.float32)
    qd = qd_ref[:].astype(jnp.float32)              # (dh, H)
    e = e_ref[:].astype(jnp.float32)                # (H, dh)

    scores = jnp.dot(k, qd, preferred_element_type=jnp.float32)  # (C, H)
    pos = j * chunk + jax.lax.broadcasted_iota(
        jnp.int32, scores.shape, dimension=0
    )
    scores = jnp.where(pos < valid, scores, NEG_INF)

    m_prev = m_ref[:]                               # (1, H)
    m_cur = jnp.max(scores, axis=0, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    corr = jnp.exp(m_prev - m_new)                  # (1, H)
    p = jnp.exp(scores - m_new)                     # (C, H)
    l_ref[:] = corr * l_ref[:] + jnp.sum(p, axis=0, keepdims=True)
    m_ref[:] = m_new

    w_exp = jnp.dot(p, e, preferred_element_type=jnp.float32)    # (C, dh)
    partial = jnp.sum(w_exp * v, axis=0, keepdims=True)          # (1, dh)
    corr_d = jnp.dot(corr, e, preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * corr_d + partial

    @pl.when(j == n_chunks - 1)
    def _():
        l_d = jnp.dot(l_ref[:], e, preferred_element_type=jnp.float32)
        o_ref[:] = (acc_ref[:] / jnp.maximum(l_d, 1e-30)).astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("n_heads", "chunk", "interpret"))
def decode_attention_flat(
    q: jax.Array,          # (B, H, hd)
    k_flat: jax.Array,     # (B, T, dh)
    v_flat: jax.Array,
    valid_len: jax.Array,  # scalar int32, or (B,) per-row counts
    *,
    n_heads: int,
    chunk: int = DEFAULT_CHUNK,
    interpret: bool | None = None,
) -> jax.Array:
    """-> (B, H, hd). One query per batch row against a flat KV block."""
    b, t, dh = k_flat.shape
    hd = dh // n_heads
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    chunk = min(chunk, _round_up(t, 128))
    t_pad = _round_up(t, chunk)
    if t_pad != t:
        k_flat = jnp.pad(k_flat, ((0, 0), (0, t_pad - t), (0, 0)))
        v_flat = jnp.pad(v_flat, ((0, 0), (0, t_pad - t), (0, 0)))

    qd = _qd(q.astype(jnp.float32), n_heads)        # (B, dh, H)
    e = jnp.asarray(_expand_matrix(n_heads, hd))
    valid = jnp.broadcast_to(
        jnp.asarray(valid_len, jnp.int32).reshape(-1), (b,)
    )

    out = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, t_pad // chunk),
            in_specs=[
                pl.BlockSpec((None, dh, n_heads), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((n_heads, dh), lambda i, j, *_: (0, 0)),
                pl.BlockSpec((None, chunk, dh), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((None, chunk, dh), lambda i, j, *_: (i, j, 0)),
            ],
            out_specs=pl.BlockSpec((None, 1, dh), lambda i, j, *_: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((1, n_heads), jnp.float32),
                pltpu.VMEM((1, n_heads), jnp.float32),
                pltpu.VMEM((1, dh), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, dh), q.dtype),
        interpret=interpret,
    )(valid, qd, e, k_flat, v_flat)
    return out.reshape(b, n_heads, hd)
