"""Pallas TPU flash attention (forward + backward) with online softmax.

The named north-star kernel replacing the reference stack's flash-attn CUDA
kernels (`attn_implementation="flash_attention_2"`,
script/distil_whisper_v2.0.sh:156; SURVEY.md §2.2): the encoder's 1500-frame
self-attention would otherwise materialize (B, H, 1500, 1500) score tensors
in HBM — these kernels keep the running max/sum/accumulator in VMEM and
stream K/V blocks, so HBM traffic is O(T·D) instead of O(T²).

Design:
  - inputs (B, T, H, D) are reshaped to (B·H, T, D); grid =
    (B·H, ceil(T/BLOCK)); kernels loop the opposite axis with lax.fori_loop;
  - forward also emits the per-row logsumexp L = m + log(l), the residual
    the backward pass needs to recompute P tiles without re-running softmax;
  - backward is the standard two-kernel split: one grid over Q blocks
    producing dQ, one over K/V blocks producing dK and dV, both streaming
    the opposite operand; D = rowsum(dO ⊙ O) is a cheap XLA elementwise
    reduce outside the kernels;
  - causal masking skips fully-masked blocks (loop bounds derived from the
    block index); sequence padding is masked via a scalar valid length;
  - the k-loop is split into a mask-free fast loop over blocks wholly
    inside valid_len (and below the causal bound) plus a masked epilogue —
    encoder ablations showed the per-element iota/compare/select was a
    large share of the softmax's VPU time (docs/DESIGN.md);
  - MXU dots take native-dtype (bf16) operands with fp32 accumulation
    (preferred_element_type); the 1/sqrt(64)=0.125 softmax scale is folded
    into q losslessly (exact in bf16). fp32-upcast operands would run the
    matmuls at the fp32 MXU rate; softmax statistics stay fp32.

On non-TPU backends the kernels run in interpreter mode (tests), so the
same code path is exercised everywhere; gradients are verified against the
XLA attention's autodiff.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
NEG_INF = -1.0e30
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453
# Non-causal sequences up to this length skip online softmax entirely: the
# whole K/V block fits VMEM (4096x64 bf16 = 512 KB) and a one-shot softmax
# needs no running max/sum corrections — the VPU bookkeeping that dominates
# the tiled kernel at encoder shapes (docs/DESIGN.md ablations).
SINGLE_STEP_MAX_K = 4096


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _scale_exact(scale: float, dtype) -> bool:
    """True when `scale` is exactly representable in `dtype` (e.g. the
    1/sqrt(64)=0.125 of every Whisper head dim), so it can be folded into q
    in the input dtype losslessly and the MXU sees native-dtype operands."""
    import numpy as np

    return float(np.asarray(scale, np.dtype(dtype))) == scale


def _fwd_kernel_single(
    valid_len_ref,
    q_ref,          # (BQ, D)
    k_ref,          # (Tk_padded, D)
    v_ref,          # (Tk_padded, D)
    o_ref,          # (BQ, D)
    lse_ref,        # (BQ, 1)
    *,
    scale: float,
    use_exp2: bool,
    no_max: bool = False,
):
    """One-shot softmax over the full key range (non-causal, K/V in VMEM).

    VPU work per score element: one bias add (tail masking), one subtract,
    one exp — no per-block running max/sum corrections, no acc rescaling.
    With use_exp2 the exponential is computed as exp2(x·log2e) (log2e folded
    into the score scale in fp32), trading one multiply for whatever the
    hardware saves on pow2 vs exp; the lse residual is converted back to
    natural-log units so the backward kernels are agnostic.

    no_max replaces the max REDUCTION over the (BQ, T) scores with a
    Cauchy-Schwarz upper bound ||q_i||·max_j||k_j||·scale computed from the
    O(T·D) operands — softmax/lse are shift-exact under ANY upper bound
    (exp(s−m)≤1 prevents overflow; the bound's slack only costs dynamic
    range, bounded by √D in the worst q⊥k case — fp32 has 80+ decades)."""
    tk = k_ref.shape[0]
    in_dtype = q_ref.dtype
    valid_len = valid_len_ref[0]

    c = scale * (LOG2E if use_exp2 else 1.0)
    exact = _scale_exact(c, in_dtype)
    q = q_ref[:] * jnp.asarray(c, in_dtype) if exact else q_ref[:]
    s = jax.lax.dot_general(
        q, k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if not exact:
        s = s * c

    # tail masking as a broadcast bias row: one add over the scores instead
    # of per-element iota/compare/select
    col = jax.lax.broadcasted_iota(jnp.int32, (1, tk), 1)
    bias = jnp.where(col < valid_len, 0.0, NEG_INF)
    s = s + bias

    if no_max:
        qf = q.astype(jnp.float32)
        kf = k_ref[:].astype(jnp.float32)
        qn = jnp.sqrt(jnp.sum(qf * qf, axis=-1, keepdims=True))  # (BQ,1)
        kn2 = jnp.sum(kf * kf, axis=-1, keepdims=True)           # (T,1)
        # mask padded k rows out of the norm max via the same bias trick
        kn2 = kn2 + jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (tk, 1), 0) < valid_len,
            0.0, NEG_INF,
        )
        kn = jnp.sqrt(jnp.maximum(jnp.max(kn2), 0.0))
        mult = 1.0 if exact else c
        m = qn * (kn * mult)                                     # (BQ,1)
    else:
        m = jnp.max(s, axis=-1, keepdims=True)
    z = s - m
    p = jnp.exp2(z) if use_exp2 else jnp.exp(z)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(in_dtype), v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[:] = (o / l_safe).astype(o_ref.dtype)
    if use_exp2:  # m is in base-2 units; lse residual stays natural-log
        lse_ref[:] = m * LN2 + jnp.log(l_safe)
    else:
        lse_ref[:] = m + jnp.log(l_safe)


def _fwd_kernel_single_int8(
    valid_len_ref,
    q_ref,          # (BQ, D) input dtype
    k8_ref,         # (Tk_padded, D) int8 (pre-quantized per key row)
    ks_ref,         # (1, Tk_padded) fp32 per-key-row scales
    v_ref,          # (Tk_padded, D) input dtype (qk mode) or int8 (qkpv)
    vs_ref,         # (1, D) fp32 per-v-column scales, or None (qk mode)
    o_ref,
    lse_ref,
    *,
    scale: float,
    pv8: bool,
    no_max: bool = False,
):
    """int8 attention core (VERDICT r2 #3): q is quantized per query row
    in-kernel, K arrives pre-quantized per key row, and QK^T runs as
    s8×s8→s32 on the MXU's double-rate int8 path (measured 1.86× bf16,
    tools/matmul_cal.py). The rank-1 dequant (q_scale_i · k_scale_j ·
    softmax_scale) is exact — only the 8-bit rounding is lossy. pv8
    additionally quantizes P (∈[0,1], fixed 127 scale) and uses per-column
    int8 V so the PV dot is int8 too. The extra VPU passes this adds
    (dequant multiply, p quantization) are the experiment's cost side —
    the core is exp-bound per docs/DESIGN.md, so the dot savings must beat
    them to win."""
    tk = k8_ref.shape[0]
    in_dtype = q_ref.dtype
    valid_len = valid_len_ref[0]

    qf = q_ref[:].astype(jnp.float32)
    qa = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
    qs = jnp.maximum(qa, 1e-8) * (1.0 / 127.0)      # (BQ, 1)
    q8 = jnp.round(qf / qs).astype(jnp.int8)

    s32 = jax.lax.dot_general(
        q8, k8_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # rank-1 exact dequant + softmax scale; fused with the tail-mask bias
    s = s32.astype(jnp.float32) * ((qs * scale) * ks_ref[:])
    col = jax.lax.broadcasted_iota(jnp.int32, (1, tk), 1)
    s = s + jnp.where(col < valid_len, 0.0, NEG_INF)

    if no_max:
        # Cauchy-Schwarz shift bound on the dequantized scores:
        # |s_ij| <= (qs_i*||q8_i||) * (ks_j*||k8_j||) * scale. L2 norms —
        # the L-inf 127^2*D bound overshoots by ~D and underflows exp.
        qn = jnp.sqrt(jnp.sum(
            q8.astype(jnp.float32) ** 2, axis=-1, keepdims=True
        ))                                             # (BQ, 1)
        k8f = k8_ref[:].astype(jnp.float32)
        kn = jnp.sqrt(jnp.sum(k8f * k8f, axis=-1))[None, :]  # (1, T)
        kmask = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, tk), 1) < valid_len,
            ks_ref[:] * kn, 0.0,
        )
        m = (qs * qn) * (scale * jnp.max(kmask))       # (BQ, 1)
    else:
        m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if pv8:
        p8 = jnp.round(p * 127.0).astype(jnp.int8)
        o32 = jax.lax.dot_general(
            p8, v_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o = o32.astype(jnp.float32) * ((1.0 / 127.0) * vs_ref[:])
    else:
        o = jax.lax.dot_general(
            p.astype(in_dtype), v_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[:] = (o / l_safe).astype(o_ref.dtype)
    lse_ref[:] = m + jnp.log(l_safe)


def _fwd_kernel(
    valid_len_ref,
    q_ref,          # (BQ, D)
    k_ref,          # (Tk_padded, D)
    v_ref,          # (Tk_padded, D)
    o_ref,          # (BQ, D)
    lse_ref,        # (BQ, 1) logsumexp residual
    *,
    block_k: int,
    causal: bool,
    scale: float,
    offset: int,
):
    bq, d = q_ref.shape
    tk = k_ref.shape[0]
    q_block = pl.program_id(1)
    valid_len = valid_len_ref[0]

    # MXU wants native-dtype (bf16) operands: fp32 upcasts before the dots
    # run the matmuls at the fp32 MXU rate (measured ~2x slower end-to-end
    # on the 1500-frame encoder). Scale is folded into q in the input dtype
    # when exact; otherwise applied to the fp32 scores.
    in_dtype = q_ref.dtype
    exact = _scale_exact(scale, in_dtype)
    q = q_ref[:] * jnp.asarray(scale, in_dtype) if exact else q_ref[:]

    num_k_blocks = tk // block_k
    if causal:
        q_end = (q_block + 1) * bq + offset
        num_k_blocks = jnp.minimum(num_k_blocks, pl.cdiv(q_end, block_k))

    # Blocks wholly inside valid_len (and, when causal, wholly below this q
    # block's first-row bound) need no mask: skipping the per-element
    # iota/compare/select there removes most of the softmax's VPU overhead
    # (5 of 6 k-blocks at T=1500, BK=256).
    full_blocks = jnp.minimum(valid_len // block_k, num_k_blocks)
    if causal:
        full_blocks = jnp.minimum(
            full_blocks, (q_block * bq + offset + 1) // block_k
        )

    def body(j, carry, *, masked):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if not exact:
            s = s * scale

        if masked:
            k_pos = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), dimension=1
            )
            mask = k_pos < valid_len
            if causal:
                q_pos = q_block * bq + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, block_k), dimension=0
                )
                mask = mask & (k_pos <= q_pos + offset)
            s = jnp.where(mask, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m_prev - m_new)
        l_new = correction * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * correction + jax.lax.dot_general(
            p.astype(in_dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    carry = jax.lax.fori_loop(
        0, full_blocks, functools.partial(body, masked=False), (acc, m0, l0)
    )
    acc, m, l = jax.lax.fori_loop(
        full_blocks, num_k_blocks, functools.partial(body, masked=True), carry
    )
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[:] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[:] = m + jnp.log(l_safe)


# ---------------------------------------------------------------------------
# backward: dQ kernel (grid over Q blocks, loops K blocks)
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(
    valid_len_ref,
    q_ref,       # (BQ, D)
    k_ref,       # (Tk_p, D)
    v_ref,       # (Tk_p, D)
    do_ref,      # (BQ, D)
    lse_ref,     # (BQ, 1)
    delta_ref,   # (BQ, 1)  D_i = rowsum(dO * O)
    dq_ref,      # (BQ, D)
    *,
    block_k: int,
    causal: bool,
    scale: float,
    offset: int,
):
    bq, d = q_ref.shape
    tk = k_ref.shape[0]
    q_block = pl.program_id(1)
    valid_len = valid_len_ref[0]

    in_dtype = q_ref.dtype
    exact = _scale_exact(scale, in_dtype)
    q = q_ref[:] * jnp.asarray(scale, in_dtype) if exact else q_ref[:]
    do = do_ref[:]
    lse = lse_ref[:]
    delta = delta_ref[:]

    num_k_blocks = tk // block_k
    if causal:
        q_end = (q_block + 1) * bq + offset
        num_k_blocks = jnp.minimum(num_k_blocks, pl.cdiv(q_end, block_k))

    def body(j, dq):
        k_blk = k_ref[pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if not exact:
            s = s * scale
        k_pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), dimension=1
        )
        mask = k_pos < valid_len
        if causal:
            q_pos = q_block * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), dimension=0
            )
            mask = mask & (k_pos <= q_pos + offset)
        s = jnp.where(mask, s, NEG_INF)
        p = jnp.exp(s - lse)                              # (BQ, BK)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta)).astype(in_dtype)
        return dq + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(0, num_k_blocks, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[:] = (dq * scale).astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# backward: dK/dV kernel (grid over K blocks, loops Q blocks)
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(
    valid_len_ref,
    q_ref,       # (Tq_p, D)
    k_ref,       # (BK, D)
    v_ref,       # (BK, D)
    do_ref,      # (Tq_p, D)
    lse_ref,     # (Tq_p, 1)
    delta_ref,   # (Tq_p, 1)
    dk_ref,      # (BK, D)
    dv_ref,      # (BK, D)
    *,
    block_q: int,
    causal: bool,
    scale: float,
    offset: int,
):
    bk, d = k_ref.shape
    tq = q_ref.shape[0]
    k_block = pl.program_id(1)
    valid_len = valid_len_ref[0]

    in_dtype = q_ref.dtype
    exact = _scale_exact(scale, in_dtype)
    k = k_ref[:]
    v = v_ref[:]

    num_q_blocks = tq // block_q
    q_start_block = 0
    if causal:
        # rows before this K block's start (shifted by the end-alignment
        # offset) are fully masked
        q_start_block = jnp.maximum(k_block * bk - offset, 0) // block_q

    def body(i, carry):
        dk, dv = carry
        q_blk = q_ref[pl.ds(i * block_q, block_q), :]
        if exact:
            q_blk = q_blk * jnp.asarray(scale, in_dtype)
        do_blk = do_ref[pl.ds(i * block_q, block_q), :]
        lse_blk = lse_ref[pl.ds(i * block_q, block_q), :]
        delta_blk = delta_ref[pl.ds(i * block_q, block_q), :]

        s = jax.lax.dot_general(  # (BQ, BK)
            q_blk, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if not exact:
            s = s * scale
        k_pos = k_block * bk + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, bk), dimension=1
        )
        mask = k_pos < valid_len
        if causal:
            q_pos = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, bk), dimension=0
            )
            mask = mask & (k_pos <= q_pos + offset)
        s = jnp.where(mask, s, NEG_INF)
        p = jnp.exp(s - lse_blk)
        p_lo = p.astype(in_dtype)
        dv = dv + jax.lax.dot_general(
            p_lo, do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_blk, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta_blk)).astype(in_dtype)
        dk = dk + jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    zeros = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(q_start_block, num_q_blocks, body, (zeros, zeros))
    if not exact:
        dk = dk * scale  # scale not folded into q on this path
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# host-side plumbing
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_t(x, t_pad):
    t = x.shape[1]
    return x if t == t_pad else jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "block_q", "block_k", "interpret", "int8_mode", "no_max"
    ),
)
def _flash_fwd(
    q, k, v, *, causal, block_q, block_k, interpret,
    int8_mode: str = "", no_max: bool = False,
):
    bh, tq, d = q.shape
    tk = k.shape[1]
    scale = 1.0 / (d**0.5)
    single = not causal and tk <= SINGLE_STEP_MAX_K
    if single:
        # default 512 chosen by on-chip sweep (docs/DESIGN.md); KWT_FA_BQ
        # overrides for experiments (tools/enc_exp.py)
        bq_max = int(os.environ.get("KWT_FA_BQ", "512"))
        block_q = min(bq_max, _round_up(tq, 128))
        block_k = _round_up(tk, 128)  # whole key range, one step
    tq_p = _round_up(tq, block_q)
    tk_p = _round_up(tk, block_k)
    q, k, v = _pad_t(q, tq_p), _pad_t(k, tk_p), _pad_t(v, tk_p)
    valid_len = jnp.full((1,), tk, jnp.int32)

    int8_mode = int8_mode if single else ""
    if int8_mode:
        # K quantized ONCE per (b·h) outside the kernel (the in-kernel
        # alternative would requantize per q-block); scales laid out (1, T)
        # so the kernel's rank-1 dequant is a lane-aligned broadcast row
        kf = k.astype(jnp.float32)
        ka = jnp.maximum(jnp.max(jnp.abs(kf), axis=-1, keepdims=True), 1e-8)
        ks = ka * (1.0 / 127.0)
        k8 = jnp.round(kf / ks).astype(jnp.int8)
        ks_row = ks[..., 0][:, None, :]                      # (bh, 1, Tk)
        pv8 = int8_mode == "qkpv"
        if pv8:
            vf = v.astype(jnp.float32)
            va = jnp.maximum(
                jnp.max(jnp.abs(vf), axis=1, keepdims=True), 1e-8
            )                                                # (bh, 1, D)
            vs = va * (1.0 / 127.0)
            v_in = jnp.round(vf / vs).astype(jnp.int8)
        else:
            vs = jnp.ones((bh, 1, d), jnp.float32)
            v_in = v
        kernel = functools.partial(
            _fwd_kernel_single_int8, scale=scale, pv8=pv8, no_max=no_max,
        )
        in_arrays = (valid_len, q, k8, ks_row, v_in, vs)
        in_specs = [
            pl.BlockSpec((None, block_q, d), lambda i, j, *_: (i, j, 0)),
            pl.BlockSpec((None, tk_p, d), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((None, 1, tk_p), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((None, tk_p, d), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((None, 1, d), lambda i, j, *_: (i, 0, 0)),
        ]
    else:
        if single:
            # exp2-with-folded-log2e measured identical to exp on v5e (the
            # lowering is the same hardware approximation); keep natural exp
            kernel = functools.partial(
                _fwd_kernel_single, scale=scale,
                use_exp2=os.environ.get("KWT_FA_EXP2", "0") != "0",
                no_max=no_max,
            )
        else:
            kernel = functools.partial(
                _fwd_kernel, block_k=block_k, causal=causal, scale=scale,
                offset=tk - tq,
            )
        in_arrays = (valid_len, q, k, v)
        in_specs = [
            pl.BlockSpec((None, block_q, d), lambda i, j, *_: (i, j, 0)),
            pl.BlockSpec((None, tk_p, d), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((None, tk_p, d), lambda i, j, *_: (i, 0, 0)),
        ]
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, tq_p // block_q),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((None, block_q, d), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((None, block_q, 1), lambda i, j, *_: (i, j, 0)),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, tq_p, d), q.dtype),
            jax.ShapeDtypeStruct((bh, tq_p, 1), jnp.float32),
        ),
        interpret=interpret,
    )(*in_arrays)
    return out[:, :tq], lse[:, :tq]


@functools.partial(
    jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret")
)
def _flash_bwd(q, k, v, out, lse, do, *, causal, block_q, block_k, interpret):
    bh, tq, d = q.shape
    tk = k.shape[1]
    scale = 1.0 / (d**0.5)
    tq_p = _round_up(tq, block_q)
    tk_p = _round_up(tk, block_k)

    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )
    qp, dop = _pad_t(q, tq_p), _pad_t(do, tq_p)
    kp, vp = _pad_t(k, tk_p), _pad_t(v, tk_p)
    # padded q rows: lse=0 would make exp(s-lse) explode on masked NEG_INF
    # rows? s is NEG_INF there once k-masking applies, so p=0 — but protect
    # the pad region with a large lse anyway.
    lse_p = jnp.pad(lse, ((0, 0), (0, tq_p - tq), (0, 0)),
                    constant_values=0.0)
    delta_p = _pad_t(delta, tq_p)
    valid_len = jnp.full((1,), tk, jnp.int32)

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, block_k=block_k, causal=causal, scale=scale,
            offset=tk - tq,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, tq_p // block_q),
            in_specs=[
                pl.BlockSpec((None, block_q, d), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((None, tk_p, d), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((None, tk_p, d), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((None, block_q, d), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((None, block_q, 1), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((None, block_q, 1), lambda i, j, *_: (i, j, 0)),
            ],
            out_specs=pl.BlockSpec((None, block_q, d), lambda i, j, *_: (i, j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bh, tq_p, d), q.dtype),
        interpret=interpret,
    )(valid_len, qp, kp, vp, dop, lse_p, delta_p)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, block_q=block_q, causal=causal, scale=scale,
            offset=tk - tq,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, tk_p // block_k),
            in_specs=[
                pl.BlockSpec((None, tq_p, d), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((None, block_k, d), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((None, block_k, d), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((None, tq_p, d), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((None, tq_p, 1), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((None, tq_p, 1), lambda i, j, *_: (i, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((None, block_k, d), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((None, block_k, d), lambda i, j, *_: (i, j, 0)),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, tk_p, d), k.dtype),
            jax.ShapeDtypeStruct((bh, tk_p, d), v.dtype),
        ),
        interpret=interpret,
    )(valid_len, qp, kp, vp, dop, lse_p, delta_p)

    return dq[:, :tq], dk[:, :tk], dv[:, :tk]


# ---------------------------------------------------------------------------
# public API with custom VJP
# ---------------------------------------------------------------------------

def _blocks(tq, tk):
    return (
        min(DEFAULT_BLOCK_Q, _round_up(tq, 128)),
        min(DEFAULT_BLOCK_K, _round_up(tk, 128)),
    )


def _to_bh(x):
    b, t, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, t, d)


def _from_bh(x, b, h):
    bh, t, d = x.shape
    return x.reshape(b, h, t, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention(q, k, v, causal):
    out, _ = _fwd_call(q, k, v, causal)
    return out


def _fwd_call(q, k, v, causal):
    b, tq, h, d = q.shape
    tk = k.shape[1]
    block_q, block_k = _blocks(tq, tk)
    interpret = jax.default_backend() != "tpu"
    # experiment switches read OUTSIDE the jit (static args -> retrace on
    # change): int8 attention core and norm-bound no-max softmax
    out, lse = _flash_fwd(
        _to_bh(q), _to_bh(k), _to_bh(v),
        causal=causal, block_q=block_q, block_k=block_k, interpret=interpret,
        int8_mode=os.environ.get("KWT_FA_INT8", ""),
        no_max=os.environ.get("KWT_FA_NOMAX", "0") != "0",
    )
    return _from_bh(out, b, h), lse


def _flash_fwd_rule(q, k, v, causal):
    out, lse = _fwd_call(q, k, v, causal)
    return out, (q, k, v, out, lse)


def _flash_bwd_rule(causal, res, g):
    q, k, v, out, lse = res
    b, tq, h, d = q.shape
    tk = k.shape[1]
    block_q, block_k = _blocks(tq, tk)
    interpret = jax.default_backend() != "tpu"
    dq, dk, dv = _flash_bwd(
        _to_bh(q), _to_bh(k), _to_bh(v), _to_bh(out), lse, _to_bh(g),
        causal=causal, block_q=block_q, block_k=block_k, interpret=interpret,
    )
    return _from_bh(dq, b, h), _from_bh(dk, b, h), _from_bh(dv, b, h)


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, *, causal: bool = False
) -> jax.Array:
    """(B, Tq, H, D) x (B, Tk, H, D) -> (B, Tq, H, D); softmax(QK^T/√D)V.

    causal requires Tq == Tk (the model's only causal use — decoder
    self-attention over a full block); rows that would attend to nothing
    are undefined under end-aligned causal masking."""
    if causal and q.shape[1] != k.shape[1]:
        raise ValueError("causal flash attention requires Tq == Tk")
    return _flash_attention(q, k, v, causal)
