"""Flash attention kernel vs XLA reference: exactness across shapes,
causal masking, padding invariance, and gradient path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kotoba_whisper_tpu.ops.attention import attention_xla
from kotoba_whisper_tpu.ops.flash_attention import flash_attention


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


@pytest.mark.parametrize(
    "b,tq,tk,h,d,causal",
    [
        (1, 128, 128, 2, 64, False),
        (2, 300, 300, 4, 64, False),   # non-multiple of block -> padding
        (1, 256, 256, 2, 64, True),
        (2, 130, 130, 2, 64, True),
        (1, 64, 512, 2, 64, False),    # cross-attention shape
    ],
)
def test_flash_matches_xla(rng, b, tq, tk, h, d, causal):
    q = _rand(rng, b, tq, h, d)
    k = _rand(rng, b, tk, h, d)
    v = _rand(rng, b, tk, h, d)
    golden = attention_xla(q, k, v, causal=causal)
    ours = flash_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(golden), atol=2e-5, rtol=1e-4
    )


def test_flash_gradient_matches_xla(rng):
    b, t, h, d = 1, 128, 2, 64
    q, k, v = _rand(rng, b, t, h, d), _rand(rng, b, t, h, d), _rand(rng, b, t, h, d)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(attention_xla(q, k, v, causal=True) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-3)


def test_model_encode_with_pallas_attn(rng):
    """encode(attn_impl='pallas') == encode(attn_impl='xla')."""
    from kotoba_whisper_tpu.models import whisper
    from tests.test_train import tiny_cfg

    cfg = tiny_cfg()
    params = whisper.init_params(jax.random.key(0), cfg)
    mel = _rand(rng, 2, cfg.num_mel_bins, 2 * cfg.max_source_positions)
    a = whisper.encode(params, cfg, mel, attn_impl="xla")
    b = whisper.encode(params, cfg, mel, attn_impl="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize(
    "tq,tk,causal",
    [(128, 128, False), (256, 256, True), (130, 300, False), (130, 130, True)],
)
def test_flash_backward_kernels_match_xla(rng, tq, tk, causal):
    """Pallas backward kernels (dQ, dK, dV) vs XLA attention autodiff."""
    b, h, d = 2, 2, 64
    q, k, v = (_rand(rng, b, tq, h, d), _rand(rng, b, tk, h, d),
               _rand(rng, b, tk, h, d))
    g = _rand(rng, b, tq, h, d)

    def f_flash(q, k, v):
        return jnp.vdot(flash_attention(q, k, v, causal=causal), g)

    def f_xla(q, k, v):
        return jnp.vdot(attention_xla(q, k, v, causal=causal), g)

    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-3,
            err_msg=f"d{name} tq={tq} tk={tk} causal={causal}",
        )


def test_flash_no_max_variant_matches(rng, monkeypatch):
    """KWT_FA_NOMAX: shift-exact softmax under the Cauchy-Schwarz bound —
    output must match the max-reduce kernel to fp accumulation noise."""
    monkeypatch.setenv("KWT_FA_NOMAX", "1")
    b, t, h, d = 2, 300, 4, 64
    q, k, v = _rand(rng, b, t, h, d), _rand(rng, b, t, h, d), _rand(rng, b, t, h, d)
    ours = flash_attention(q, k, v)
    monkeypatch.delenv("KWT_FA_NOMAX")
    golden = attention_xla(q, k, v)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(golden), atol=2e-5, rtol=1e-4
    )


@pytest.mark.parametrize("mode", ["qk", "qkpv"])
def test_flash_int8_core_close(monkeypatch, mode):
    """KWT_FA_INT8: the s8 MXU score path holds cosine > 0.999 per row vs
    the exact kernel (8-bit rounding is the only loss; scale folding is
    exact by construction). Dedicated seed — the shared rng fixture's
    state depends on suite order and this is a numeric-threshold test."""
    monkeypatch.setenv("KWT_FA_INT8", mode)
    rng = np.random.default_rng(1234)
    b, t, h, d = 2, 300, 4, 64
    q, k, v = _rand(rng, b, t, h, d), _rand(rng, b, t, h, d), _rand(rng, b, t, h, d)
    ours = np.asarray(flash_attention(q, k, v), np.float32)
    monkeypatch.delenv("KWT_FA_INT8")
    golden = np.asarray(attention_xla(q, k, v), np.float32)
    num = np.sum(ours * golden, axis=-1)
    cos = num / (
        np.linalg.norm(ours, axis=-1) * np.linalg.norm(golden, axis=-1) + 1e-12
    )
    assert cos.min() > 0.999, cos.min()


def test_flash_int8_nomax_combined(monkeypatch):
    """int8 score path + norm-bound shift compose (KWT_FA_INT8=qk with
    KWT_FA_NOMAX=1)."""
    monkeypatch.setenv("KWT_FA_INT8", "qk")
    monkeypatch.setenv("KWT_FA_NOMAX", "1")
    rng = np.random.default_rng(99)
    b, t, h, d = 2, 300, 4, 64
    q, k, v = _rand(rng, b, t, h, d), _rand(rng, b, t, h, d), _rand(rng, b, t, h, d)
    ours = np.asarray(flash_attention(q, k, v), np.float32)
    golden = np.asarray(attention_xla(q, k, v), np.float32)
    num = np.sum(ours * golden, axis=-1)
    cos = num / (
        np.linalg.norm(ours, axis=-1) * np.linalg.norm(golden, axis=-1) + 1e-12
    )
    assert cos.min() > 0.999, cos.min()
