"""Pallas fused LayerNorm (and residual-add + LayerNorm) for TPU.

The encoder HLO analysis (docs/DESIGN.md "encoder headroom") showed the
fp32 LayerNorm reductions cost several full HBM passes over the
activations per layer: XLA materializes the fp32 upcast and keeps the
mean/variance reductions as separate fusions. These kernels do the whole
normalization — upcast, mean, variance, rsqrt, scale/bias, downcast — in
one HBM read + one write per tensor, in VMEM.

`add_layer_norm` additionally fuses the residual add that precedes every
LayerNorm in a pre-LN transformer block (h = LN(x + attn_out)): it emits
BOTH the bf16 residual sum (the next block's carry) and the normalized
output in a single pass, saving one full read of the activations per
block half.

Numerics: reductions in fp32; the residual sum is rounded to the storage
dtype BEFORE normalization so the fused op sees exactly the tensor the
unfused `x = x + y; layer_norm(x)` sequence would (models/whisper.py
layer_norm). Outputs agree with the XLA path up to fp32 reduction order
(<=1 ulp of the storage dtype).

Replaces the LayerNorm the reference gets from torch ATen inside
`WhisperForConditionalGeneration` (SURVEY.md §2.2, run_distillation.py:466-484).
Inference-path kernels (no custom VJP); training keeps the XLA LayerNorm,
whose backward XLA already fuses well.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_ROWS = 256


def _ln_rows(x32, scale, bias, eps):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * scale + bias


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps):
    x32 = x_ref[:].astype(jnp.float32)
    s = s_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    o_ref[:] = _ln_rows(x32, s, b, eps).astype(o_ref.dtype)


def _add_ln_kernel(x_ref, y_ref, s_ref, b_ref, sum_ref, o_ref, *, eps):
    acc = x_ref[:].astype(jnp.float32) + y_ref[:].astype(jnp.float32)
    summed = acc.astype(sum_ref.dtype)
    sum_ref[:] = summed
    s = s_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    # normalize the ROUNDED sum so fused == (add; layer_norm) bit-exactly
    o_ref[:] = _ln_rows(summed.astype(jnp.float32), s, b, eps).astype(
        o_ref.dtype
    )


def _as2d(x):
    return x.reshape(-1, x.shape[-1])


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def layer_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    eps: float = 1e-5,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: bool | None = None,
) -> jax.Array:
    """LayerNorm over the last axis; any leading shape."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    x2 = _as2d(x)
    n, d = x2.shape
    rows = min(block_rows, n)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(pl.cdiv(n, rows),),
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
        interpret=interpret,
    )(x2, scale, bias)
    return out.reshape(shape)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def add_layer_norm(
    x: jax.Array,
    y: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    eps: float = 1e-5,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Returns (x + y, LayerNorm(x + y)) in one fused HBM pass."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    x2, y2 = _as2d(x), _as2d(y)
    n, d = x2.shape
    rows = min(block_rows, n)
    summed, out = pl.pallas_call(
        functools.partial(_add_ln_kernel, eps=eps),
        grid=(pl.cdiv(n, rows),),
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0)),
            pl.BlockSpec((rows, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0)),
            pl.BlockSpec((rows, d), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x.dtype),
            jax.ShapeDtypeStruct((n, d), x.dtype),
        ],
        interpret=interpret,
    )(x2, y2, scale, bias)
    return summed.reshape(shape), out.reshape(shape)
