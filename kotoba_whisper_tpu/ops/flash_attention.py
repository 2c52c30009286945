"""Pallas TPU flash attention (forward) with online softmax.

The named north-star kernel replacing the reference stack's flash-attn CUDA
kernels (`attn_implementation="flash_attention_2"`,
script/distil_whisper_v2.0.sh:156; SURVEY.md §2.2): the encoder's 1500-frame
self-attention would otherwise materialize (B, H, 1500, 1500) score tensors
in HBM — this kernel keeps the running max/sum/accumulator in VMEM and
streams K/V blocks, so HBM traffic is O(T·D) instead of O(T²).

Design:
  - inputs (B, T, H, D) are reshaped to (B·H, T, D); grid =
    (B·H, ceil(Tq/BQ)); the kernel loops K/V blocks with lax.fori_loop;
  - causal masking skips fully-masked K blocks (the loop upper bound is
    derived from the Q block index);
  - sequence padding is masked via a scalar valid-length (SMEM) so callers
    can pad T to a lane multiple without changing results;
  - fp32 accumulation regardless of input dtype (bf16 in production);
  - backward: custom_vjp recomputes attention with the XLA path — exact
    same math, trades HBM for FLOPs (flash backward kernel is future work).

On non-TPU backends the kernel runs in interpreter mode (tests), so the
same code path is exercised everywhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kotoba_whisper_tpu.ops.attention import attention_xla

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
NEG_INF = -1.0e30


def _attn_kernel(
    valid_len_ref,  # SMEM (1,)
    q_ref,          # (BQ, D)
    k_ref,          # (Tk_padded, D)
    v_ref,          # (Tk_padded, D)
    o_ref,          # (BQ, D)
    *,
    block_k: int,
    causal: bool,
    scale: float,
):
    bq, d = q_ref.shape
    tk = k_ref.shape[0]
    q_block = pl.program_id(1)
    valid_len = valid_len_ref[0]

    q = q_ref[:].astype(jnp.float32) * scale

    num_k_blocks = tk // block_k
    if causal:
        # K block j is relevant while j*block_k <= q_end
        q_end = (q_block + 1) * bq
        num_k_blocks = jnp.minimum(
            num_k_blocks, pl.cdiv(q_end, block_k)
        )

    def body(j, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)

        k_pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), dimension=1
        )
        mask = k_pos < valid_len
        if causal:
            q_pos = q_block * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), dimension=0
            )
            mask = mask & (k_pos <= q_pos)
        s = jnp.where(mask, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m_prev - m_new)
        l_new = correction * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * correction + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k_blocks, body, (acc, m0, l0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret")
)
def _flash_fwd(
    q: jax.Array,  # (BH, Tq, D)
    k: jax.Array,  # (BH, Tk, D)
    v: jax.Array,
    *,
    causal: bool,
    block_q: int,
    block_k: int,
    interpret: bool,
) -> jax.Array:
    bh, tq, d = q.shape
    tk = k.shape[1]
    scale = 1.0 / (d**0.5)

    tq_p = _round_up(tq, block_q)
    tk_p = _round_up(tk, block_k)
    if tq_p != tq:
        q = jnp.pad(q, ((0, 0), (0, tq_p - tq), (0, 0)))
    if tk_p != tk:
        k = jnp.pad(k, ((0, 0), (0, tk_p - tk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, tk_p - tk), (0, 0)))

    valid_len = jnp.full((1,), tk, jnp.int32)
    grid = (bh, tq_p // block_q)

    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, block_k=block_k, causal=causal, scale=scale
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (None, block_q, d), lambda i, j, *_: (i, j, 0)
                ),
                pl.BlockSpec((None, tk_p, d), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((None, tk_p, d), lambda i, j, *_: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (None, block_q, d), lambda i, j, *_: (i, j, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((bh, tq_p, d), q.dtype),
        interpret=interpret,
    )(valid_len, q, k, v)
    return out[:, :tq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention(q, k, v, causal):
    return _flash_call(q, k, v, causal)


def _flash_call(q, k, v, causal):
    b, tq, h, d = q.shape
    tk = k.shape[1]
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    interpret = jax.default_backend() != "tpu"
    block_q = min(DEFAULT_BLOCK_Q, _round_up(tq, 128))
    block_k = min(DEFAULT_BLOCK_K, _round_up(tk, 128))
    out = _flash_fwd(
        qf, kf, vf,
        causal=causal, block_q=block_q, block_k=block_k, interpret=interpret,
    )
    return out.reshape(b, h, tq, d).transpose(0, 2, 1, 3)


def _flash_fwd_rule(q, k, v, causal):
    return _flash_call(q, k, v, causal), (q, k, v)


def _flash_bwd_rule(causal, res, g):
    # exact-math recompute through the XLA attention path
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q, k, v: attention_xla(q, k, v, causal=causal), q, k, v
    )
    return vjp(g)


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, *, causal: bool = False
) -> jax.Array:
    """(B, Tq, H, D) x (B, Tk, H, D) -> (B, Tq, H, D); softmax(QK^T/√D)V."""
    return _flash_attention(q, k, v, causal)
