"""Fused Pallas audio-stem kernel: conv1(k3,s1) + GELU + conv2(k3,s2) + GELU.

The SURVEY §2.2 north-star stem kernel (reference executes the stem inside
WhisperForConditionalGeneration via torch ATen, run_distillation.py:466-484;
behavior at models/whisper.py:conv1d/encode). Measured motivation
(tools/stem_exp.py, B=48 large-v3): XLA's conv_general_dilated runs the
stem at ~23 TFLOP/s — ~6x off the calibrated ~158 TFLOP/s GEMM rate —
costing ~36 ms ≈ 4% of the encoder forward.

TPU-first design:
- one grid cell = (batch row, 128-row tile of the 1500-frame output); the
  whole (T+pad, n_mels) input row stays VMEM-resident across the tile axis;
- conv1 = three shifted-slice dots (tile+halo, C_in)@(C_in, D) accumulated
  in fp32 — no im2col temp, no strided access;
- the stride-2 conv2 avoids strided row gathers entirely with a PAIR
  reshape: P = y1.reshape(rows/2, 2D) makes y2 = P[:t]@[V0;V1] +
  P[1:t+1, :D]@V2 — two contiguous-slice dots;
- conv2's zero-padding applies to the post-GELU conv1 OUTPUT, so rows
  outside [0, 3000) are zeroed after the GELU (index mask), exactly the
  torch Conv1d(padding=1) semantics;
- GELU is exact (erf), matching models/whisper.py encode(); intermediate
  precision equals the XLA path (fp32 accum -> compute-dtype -> GELU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _erf(z):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| <= 1.5e-7): Mosaic
    lowers neither erf nor erfc, but exp and the VPU arithmetic here are
    native. The approximation error is ~50x below bf16 resolution, so
    the kernel's bf16 outputs match the XLA stem's."""
    s = jnp.where(z >= 0.0, 1.0, -1.0)
    za = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * za)
    poly = t * (
        0.254829592
        + t * (-0.284496736
               + t * (1.421413741
                      + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-za * za))


def _gelu_exact(x):
    """erf-form exact GELU (jax.nn.gelu(approximate=False) semantics)."""
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + _erf(xf * (2.0 ** -0.5)))).astype(x.dtype)


def _stem_kernel(
    x0_ref, x1_ref, x2_ref, w1_ref, b1_ref, vv_ref, v2_ref, b2_ref,
    out_ref, *, block_t2: int, t1: int, d_model: int,
):
    t0 = pl.program_id(1)
    base2 = t0 * block_t2
    nr1 = 2 * block_t2 + 8
    s = 2 * base2
    # conv1: y1[l] corresponds to conv1-output index i = 2*base2 - 1 + l;
    # y1[i] = sum_d x[i+d-1] @ W_d. The three d-shifts arrive as three
    # PRE-SHIFTED input rows (xd[k] = x[k + d - 2]) so every dynamic
    # slice starts at s = 2*base2 — a multiple of the sublane tile, which
    # Mosaic requires for vector loads (s+d would not be).
    acc = jnp.zeros((nr1, d_model), jnp.float32)
    for d, xd_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        xs = xd_ref[0, pl.ds(s, nr1), :]
        acc = acc + jax.lax.dot_general(
            xs, w1_ref[d],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    y1 = (acc + b1_ref[...].astype(jnp.float32)).astype(out_ref.dtype)
    y1 = _gelu_exact(y1)
    i_abs = 2 * base2 - 1 + jax.lax.broadcasted_iota(
        jnp.int32, (nr1, 1), 0
    )
    y1 = jnp.where((i_abs >= 0) & (i_abs < t1), y1, 0)
    # conv2 stride 2 via pair-rows: P[r] = [y1[2r], y1[2r+1]];
    # y2[j] = y1[2j]V0 + y1[2j+1]V1 + y1[2j+2]V2
    #       = P[j] @ [V0;V1] + P[j+1][:D] @ V2
    p = y1.reshape(nr1 // 2, 2 * d_model)
    y2 = jax.lax.dot_general(
        p[:block_t2], vv_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y2 = y2 + jax.lax.dot_general(
        p[1 : block_t2 + 1, :d_model], v2_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y2 = (y2 + b2_ref[...].astype(jnp.float32)).astype(out_ref.dtype)
    out_ref[0] = _gelu_exact(y2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv_stem_pallas(conv1: dict, conv2: dict, x, *, interpret: bool = False):
    """(B, n_mels, T) log-mel -> (B, T//2, d_model), stem fused in one
    kernel. conv1/conv2: {"kernel" (3, C_in, C_out), "bias" (C_out,)}."""
    b, c_in, t1 = x.shape
    d_model = conv1["kernel"].shape[2]
    assert conv2["kernel"].shape[1] == d_model
    t2 = t1 // 2
    dtype = x.dtype
    block_t2 = 128
    t2_pad = _round_up(t2, block_t2)
    c_pad = _round_up(c_in, 128)
    d_pad = _round_up(d_model, 128)

    # (B, T, C) layout, feature axis lane-padded; three shifted views
    # (xd[k] = x[k + d - 2]) so in-kernel slice starts stay tile-aligned
    xt = jnp.transpose(x, (0, 2, 1))
    xt = jnp.pad(xt, ((0, 0), (2, 2 * t2_pad + 8 + 2 - t1), (0, c_pad - c_in)))
    r_rows = 2 * t2_pad + 8
    x_sh = [xt[:, d : d + r_rows] for d in range(3)]

    w1 = jnp.pad(
        conv1["kernel"].astype(dtype),
        ((0, 0), (0, c_pad - c_in), (0, d_pad - d_model)),
    )
    b1 = jnp.pad(conv1["bias"], ((0, d_pad - d_model),)).astype(dtype)[None]
    v = jnp.pad(
        conv2["kernel"].astype(dtype),
        ((0, 0), (0, d_pad - d_model), (0, d_pad - d_model)),
    )
    vv01 = jnp.concatenate([v[0], v[1]], axis=0)        # (2*d_pad, d_pad)
    b2 = jnp.pad(conv2["bias"], ((0, d_pad - d_model),)).astype(dtype)[None]

    n_blocks = t2_pad // block_t2
    out = pl.pallas_call(
        functools.partial(
            _stem_kernel, block_t2=block_t2, t1=t1, d_model=d_pad,
        ),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, r_rows, c_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, r_rows, c_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, r_rows, c_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((3, c_pad, d_pad), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0)),
            pl.BlockSpec((2 * d_pad, d_pad), lambda i, j: (0, 0)),
            pl.BlockSpec((d_pad, d_pad), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d_pad), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_t2, d_pad), lambda i, j: (i, j, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, t2_pad, d_pad), dtype),
        interpret=interpret,
    )(*x_sh, w1, b1, vv01, v[2], b2)
    return out[:, :t2, :d_model]
