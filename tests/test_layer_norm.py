"""Pallas fused LayerNorm vs the model's XLA layer_norm (bit-exact spec)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kotoba_whisper_tpu.models.whisper import layer_norm as ln_xla
from kotoba_whisper_tpu.ops.layer_norm import add_layer_norm, layer_norm


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(4, 37, 128), (640, 256)])
def test_layer_norm_matches_xla(dtype, shape):
    rng = np.random.default_rng(0)
    d = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape), dtype) * 3 + 1
    p = {
        "scale": jnp.asarray(rng.standard_normal(d), jnp.float32),
        "bias": jnp.asarray(rng.standard_normal(d), jnp.float32),
    }
    got = layer_norm(x, p["scale"], p["bias"], block_rows=64)
    want = ln_xla(p, x)
    atol = 5e-2 if dtype == jnp.bfloat16 else 1e-5  # <=1 ulp at |x|~3
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=atol
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_add_layer_norm_matches_unfused(dtype):
    rng = np.random.default_rng(1)
    shape, d = (3, 96, 128), 128
    x = jnp.asarray(rng.standard_normal(shape), dtype)
    y = jnp.asarray(rng.standard_normal(shape), dtype)
    p = {
        "scale": jnp.asarray(rng.standard_normal(d), jnp.float32),
        "bias": jnp.asarray(rng.standard_normal(d), jnp.float32),
    }
    summed, normed = add_layer_norm(x, y, p["scale"], p["bias"], block_rows=32)
    want_sum = x + y
    np.testing.assert_array_equal(np.asarray(summed), np.asarray(want_sum))
    atol = 5e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(
        np.asarray(normed, np.float32),
        np.asarray(ln_xla(p, want_sum), np.float32),
        atol=atol,
    )


def test_non_divisible_rows():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((7, 130, 128)), jnp.float32)
    p = {"scale": jnp.ones((128,)), "bias": jnp.zeros((128,))}
    got = layer_norm(x, p["scale"], p["bias"], block_rows=256)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ln_xla(p, x)), atol=1e-6
    )
