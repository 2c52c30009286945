"""Pallas decode-step attention over flat (lane-packed) KV caches.

Why this kernel exists (found via xprof on the real chip): incremental
decode re-reads the whole cross-attention K/V every step — for large-v3
that is 32 layers x 2 tensors x (B, 1500, 20 heads, 64) per token. With
heads kept as separate minor dims, XLA pads the last dim 64 -> 128 lanes
and the head dim to sublane multiples, roughly DOUBLING the HBM footprint
and read traffic of the single biggest consumer in the pipeline (and
capping the feasible batch). Storing K/V flat as (B, T, H*64) is
padding-free; this kernel streams the flat layout HBM->VMEM in chunks and
does the per-head softmax(qK^T/√d)V math in VMEM with online (flash-style)
normalization, where re-slicing costs nothing.

Shapes: q (B, H, hd) one query per row; k/v (B, T, H*hd) flat; valid_len
masks the tail (cache capacity beyond the fill, or encoder padding).
Grid is (B, T/chunk): TPU grid steps run sequentially per core, so the
running max/sum/accumulator live in scratch across chunk steps and the
output is written on the last chunk. fp32 accumulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30
DEFAULT_CHUNK = 512


def _kernel(
    valid_len_ref,
    q_ref,      # (H, hd)
    k_ref,      # (CHUNK, H*hd)
    v_ref,      # (CHUNK, H*hd)
    o_ref,      # (H, hd)
    m_ref,      # scratch (H, 1) running max
    l_ref,      # scratch (H, 1) running sum
    acc_ref,    # scratch (H, hd) running accumulator
    *,
    n_heads: int,
    head_dim: int,
    chunk: int,
):
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    valid = valid_len_ref[0]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:].astype(jnp.float32)          # (H, hd)
    k = k_ref[:].astype(jnp.float32)          # (C, H*hd)
    v = v_ref[:].astype(jnp.float32)

    scale = 1.0 / (head_dim**0.5)
    qf = q.reshape(1, n_heads * head_dim) * scale
    prod = k * qf                              # (C, H*hd)
    scores = jnp.sum(
        prod.reshape(chunk, n_heads, head_dim), axis=-1
    ).T                                        # (H, C)
    pos = j * chunk + jax.lax.broadcasted_iota(
        jnp.int32, (n_heads, chunk), dimension=1
    )
    scores = jnp.where(pos < valid, scores, NEG_INF)

    m_prev = m_ref[:]
    m_cur = jnp.max(scores, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)                # (H, C)
    l_ref[:] = corr * l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new

    # acc_h += sum_c p[h,c] * v[c, h]  on the flat layout
    pv = jnp.sum(
        p.T.reshape(chunk, n_heads, 1) * v.reshape(chunk, n_heads, head_dim),
        axis=0,
    )                                          # (H, hd)
    acc_ref[:] = acc_ref[:] * corr + pv

    @pl.when(j == n_chunks - 1)
    def _():
        o_ref[:] = (
            acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        ).astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("n_heads", "chunk", "interpret"))
def decode_attention_flat(
    q: jax.Array,          # (B, H, hd)
    k_flat: jax.Array,     # (B, T, H*hd)
    v_flat: jax.Array,
    valid_len: jax.Array,  # scalar int32
    *,
    n_heads: int,
    chunk: int = DEFAULT_CHUNK,
    interpret: bool | None = None,
) -> jax.Array:
    """-> (B, H, hd). One query per batch row against a flat KV block."""
    b, t, dh = k_flat.shape
    head_dim = dh // n_heads
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    chunk = min(chunk, _round_up(t, 128))
    t_pad = _round_up(t, chunk)
    if t_pad != t:
        k_flat = jnp.pad(k_flat, ((0, 0), (0, t_pad - t), (0, 0)))
        v_flat = jnp.pad(v_flat, ((0, 0), (0, t_pad - t), (0, 0)))
    valid = jnp.full((1,), valid_len, jnp.int32)

    return pl.pallas_call(
        functools.partial(
            _kernel, n_heads=n_heads, head_dim=head_dim, chunk=chunk
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, t_pad // chunk),
            in_specs=[
                pl.BlockSpec((None, n_heads, head_dim), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((None, chunk, dh), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((None, chunk, dh), lambda i, j, *_: (i, j, 0)),
            ],
            out_specs=pl.BlockSpec(
                (None, n_heads, head_dim), lambda i, j, *_: (i, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((n_heads, 1), jnp.float32),
                pltpu.VMEM((n_heads, 1), jnp.float32),
                pltpu.VMEM((n_heads, head_dim), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_heads, head_dim), q.dtype),
        interpret=interpret,
    )(valid, q, k_flat, v_flat)


def decode_attention_reference(q, k_flat, v_flat, valid_len, *, n_heads):
    """XLA reference path (same math, used on CPU and for verification)."""
    b, t, dh = k_flat.shape
    hd = dh // n_heads
    k = k_flat.reshape(b, t, n_heads, hd)
    v = v_flat.reshape(b, t, n_heads, hd)
    scale = 1.0 / (hd**0.5)
    scores = jnp.einsum(
        "bhd,bthd->bht", (q * scale).astype(jnp.float32), k.astype(jnp.float32)
    )
    mask = jnp.arange(t)[None, None, :] < valid_len
    scores = jnp.where(mask, scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bht,bthd->bhd", w, v.astype(jnp.float32))
    return out.astype(q.dtype)
