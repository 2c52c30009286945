"""Flat-KV decode attention kernel: exactness vs the reference path and vs
plain per-head attention, incl. valid-length masking and chunked padding."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kotoba_whisper_tpu.ops.decode_attention import (
    decode_attention_flat,
    decode_attention_reference,
)


@pytest.mark.parametrize(
    "b,t,h,hd,valid,chunk",
    [
        (2, 128, 4, 64, 128, 128),
        (3, 300, 4, 64, 300, 128),   # padding to chunk multiple
        (2, 1500, 20, 64, 1500, 512),  # large-v3 cross shape
        (2, 51, 4, 64, 7, 128),      # partially-filled self cache
    ],
)
def test_flat_kernel_matches_reference(rng, b, t, h, hd, valid, chunk):
    q = jnp.asarray(rng.standard_normal((b, h, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h * hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h * hd)), jnp.float32)
    golden = decode_attention_reference(
        q, k, v, jnp.asarray(valid), n_heads=h
    )
    ours = decode_attention_flat(
        q, k, v, jnp.asarray(valid), n_heads=h, chunk=chunk
    )
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(golden), atol=2e-5, rtol=1e-4
    )


def test_reference_matches_headwise_attention(rng):
    from kotoba_whisper_tpu.ops.attention import attention_xla

    b, t, h, hd = 2, 64, 4, 32
    q = jnp.asarray(rng.standard_normal((b, h, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h * hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h * hd)), jnp.float32)
    ref = decode_attention_reference(q, k, v, jnp.asarray(t), n_heads=h)
    golden = attention_xla(
        q[:, None].transpose(0, 1, 2, 3).reshape(b, 1, h, hd),
        k.reshape(b, t, h, hd),
        v.reshape(b, t, h, hd),
    )[:, 0]
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(golden), atol=2e-5, rtol=1e-4
    )


def test_bf16_path(rng):
    b, t, h, hd = 2, 256, 4, 64
    q = jnp.asarray(rng.standard_normal((b, h, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, t, h * hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, t, h * hd)), jnp.bfloat16)
    golden = decode_attention_reference(q, k, v, jnp.asarray(t), n_heads=h)
    ours = decode_attention_flat(q, k, v, jnp.asarray(t), n_heads=h)
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(golden, np.float32),
        atol=2e-2, rtol=2e-2,
    )
