"""Fused Pallas conv-stem kernel parity (ops/conv_stem.py) vs the XLA
stem in models/whisper.py encode() — conv1(k3,s1)+GELU+conv2(k3,s2)+GELU
with torch Conv1d(padding=1) semantics (the stem the reference runs via
ATen inside WhisperForConditionalGeneration, run_distillation.py:466)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kotoba_whisper_tpu.core.config import PRESETS
from kotoba_whisper_tpu.models import whisper
from kotoba_whisper_tpu.ops.conv_stem import conv_stem_pallas


def _xla_stem(enc, x):
    h = jnp.transpose(x, (0, 2, 1))
    h = jax.nn.gelu(whisper.conv1d(enc["conv1"], h, 1), approximate=False)
    return jax.nn.gelu(whisper.conv1d(enc["conv2"], h, 2), approximate=False)


@pytest.mark.parametrize("preset,b,t", [
    ("test-tiny", 2, 3000),   # d_model 64 -> lane-padded
    ("test-tiny", 1, 256),    # short input, tail-masked tile
])
def test_stem_kernel_matches_xla(preset, b, t):
    cfg = PRESETS[preset]
    params = whisper.init_params(jax.random.key(0), cfg)
    enc = params["encoder"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((b, cfg.num_mel_bins, t)) * 0.3, jnp.float32
    )
    ref = np.asarray(_xla_stem(enc, x))
    got = np.asarray(
        conv_stem_pallas(enc["conv1"], enc["conv2"], x, interpret=True)
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)


def test_stem_kernel_bf16_close():
    """bf16 path: fp32-accumulated dots, compute-dtype GELUs — same
    precision contract as the XLA stem in bf16."""
    cfg = PRESETS["test-tiny"]
    params = whisper.init_params(jax.random.key(1), cfg)
    enc = jax.tree.map(lambda v: v.astype(jnp.bfloat16), params["encoder"])
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.standard_normal((1, cfg.num_mel_bins, 600)) * 0.3, jnp.bfloat16
    )
    ref = np.asarray(_xla_stem(enc, x), np.float32)
    got = np.asarray(
        conv_stem_pallas(enc["conv1"], enc["conv2"], x, interpret=True),
        np.float32,
    )
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)


def test_encode_stem_impl_pallas_matches_xla():
    """encode(stem_impl="pallas") is a drop-in for the default stem."""
    cfg = PRESETS["test-tiny"]
    params = whisper.init_params(jax.random.key(2), cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(
        rng.standard_normal((2, cfg.num_mel_bins, 3000)) * 0.3, jnp.float32
    )
    ref = np.asarray(whisper.encode(params, cfg, x))
    got = np.asarray(whisper.encode(params, cfg, x, stem_impl="pallas"))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)
