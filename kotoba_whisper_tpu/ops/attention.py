"""Multi-head attention compute paths.

Replaces the reference's `attn_implementation` dispatch (sdpa/flash-attn-2 at
run_pseudo_labelling.py:64, run_distillation.py:100, SURVEY.md §2.2) with two
TPU paths behind one signature:

  - "xla":    einsum attention with fp32 softmax — XLA fuses this well and it
              is the reference numeric path for tests.
  - "pallas": fused flash-attention kernel (ops/flash_attention.py), used on
              TPU for the 1500-frame encoder self-attention where the
              materialized (B,H,1500,1500) score tensor is HBM-bound.

Inputs are (B, T, H, D) per-head tensors; scaling 1/sqrt(D) is applied to q
(matching Whisper's convention of scaling queries).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    *,
    causal: bool = False,
) -> jax.Array:
    """(B, Tq, H, D), (B, Tk, H, D) -> (B, Tq, H, D).

    mask: optional boolean (B, 1, Tq, Tk) or (B, H, Tq, Tk); True = attend.
    Softmax in fp32 regardless of input dtype.
    """
    in_dtype = q.dtype
    d = q.shape[-1]
    scale = jnp.asarray(1.0 / (d**0.5), in_dtype)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if causal:
        tq, tk = scores.shape[-2], scores.shape[-1]
        causal_mask = (
            jnp.arange(tk)[None, :] <= jnp.arange(tq)[:, None] + (tk - tq)
        )
        scores = jnp.where(causal_mask[None, None], scores, -jnp.inf)
    if mask is not None:
        scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(in_dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(in_dtype)


def attention(q, k, v, mask=None, *, causal=False, impl: str = "xla"):
    if impl == "pallas":
        from kotoba_whisper_tpu.ops.flash_attention import flash_attention

        if mask is None:
            return flash_attention(q, k, v, causal=causal)
        # masked paths (decode with padded KV) fall back to XLA for now
    return attention_xla(q, k, v, mask, causal=causal)
