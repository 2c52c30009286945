"""int8 (w8a8) quantized-inference tests (models/quantized.py).

The scheme is validated three ways: exactness on synthetically
representable values (the dequantized product must be bit-equal to the
fp32 product when both operands are exact int8 multiples of their scales),
statistical closeness of a full quantized encoder pass, and that the whole
greedy-decode path runs (and stays close) with quantized params across
KV-cache dtypes.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kotoba_whisper_tpu.core.config import PRESETS, SpecialTokens
from kotoba_whisper_tpu.decode.greedy import GenerateOptions, generate_greedy
from kotoba_whisper_tpu.models import whisper
from kotoba_whisper_tpu.models.optimized import fuse_for_inference
from kotoba_whisper_tpu.models.quantized import (
    dense_int8,
    quantize_dense_int8,
    quantize_for_inference,
)

CFG = PRESETS["test-tiny"]
ST = SpecialTokens.for_vocab(CFG.vocab_size)


def test_dense_int8_exact_on_representable_values():
    """Weights that are exact int8 multiples of a per-column scale and
    activations that are exact multiples of their per-row absmax/127 must
    round-trip losslessly: dequantized == fp32 product."""
    rng = np.random.default_rng(0)
    w_int = rng.integers(-127, 128, size=(16, 8)).astype(np.float32)
    w_scale = rng.uniform(0.5, 2.0, size=(1, 8)).astype(np.float32)
    # ensure each column's absmax is 127 so scale reconstruction is exact
    w_int[0] = 127.0
    kernel = w_int * w_scale
    x_int = rng.integers(-127, 128, size=(4, 16)).astype(np.float32)
    x_int[:, 0] = 127.0  # per-row absmax = 127 -> s_x exactly x_scale
    x_scale = np.float32(0.03125)  # power of two: exact in fp32
    x = x_int * x_scale

    p = quantize_dense_int8({"kernel": jnp.asarray(kernel)})
    got = np.asarray(dense_int8(p, jnp.asarray(x)))
    want = x @ kernel
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


def test_quantize_transform_structure():
    params = fuse_for_inference(whisper.init_params(jax.random.key(0), CFG))
    q = quantize_for_inference(params)
    enc_attn = q["encoder"]["layers"]["self_attn"]
    assert enc_attn["qkv_proj"]["kernel_q"].dtype == jnp.int8
    # stacked (L, in, out) kernels -> per (layer, out-channel) scales
    assert enc_attn["qkv_proj"]["kernel_scale"].shape == (
        CFG.encoder_layers, 3 * CFG.d_model,
    )
    assert "kernel" not in enc_attn["qkv_proj"]
    # non-dense leaves untouched
    assert q["encoder"]["layers"]["self_attn_layer_norm"]["scale"].shape == (
        CFG.encoder_layers, CFG.d_model,
    )
    assert "embedding" in q["decoder"]["embed_tokens"]


def test_quantized_encode_close():
    params = fuse_for_inference(whisper.init_params(jax.random.key(0), CFG))
    qparams = quantize_for_inference(params)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(
        rng.standard_normal(
            (2, CFG.num_mel_bins, CFG.max_source_positions * 2)
        ).astype(np.float32)
        * 0.1
    )
    base = np.asarray(whisper.encode(params, CFG, mel)).astype(np.float64)
    got = np.asarray(whisper.encode(qparams, CFG, mel)).astype(np.float64)
    cos = np.sum(base * got) / (
        np.linalg.norm(base) * np.linalg.norm(got) + 1e-12
    )
    assert cos > 0.999, f"quantized encoder diverged: cos={cos}"
    rel = np.linalg.norm(base - got) / (np.linalg.norm(base) + 1e-12)
    assert rel < 0.05, f"relative error too large: {rel}"


@pytest.mark.parametrize("kv_dtype", ["compute", "int8"])
def test_quantized_greedy_decode_runs(kv_dtype):
    """End-to-end greedy decode with w8a8 params across cache dtypes: the
    full path (encode, cross-KV init through quantized kv_proj, per-step
    quantized projections, logits) must produce a valid token tensor with
    a high agreement rate vs the fp32 run (random tiny models put many
    token pairs near decision boundaries, so exact parity is not expected
    of a quantized path)."""
    params = fuse_for_inference(whisper.init_params(jax.random.key(2), CFG))
    qparams = quantize_for_inference(params)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(
        rng.standard_normal(
            (3, CFG.num_mel_bins, CFG.max_source_positions * 2)
        ).astype(np.float32)
        * 0.1
    )
    prompt = (ST.sot, ST.lang_begin + 6, ST.transcribe)
    opts = GenerateOptions(prompt_ids=prompt, max_length=12)
    base = np.asarray(generate_greedy(params, CFG, mel, opts, ST))
    got = np.asarray(
        generate_greedy(qparams, CFG, mel, opts, ST, kv_dtype=kv_dtype)
    )
    assert got.shape == base.shape
    assert got.dtype == base.dtype
    # prompt region is forced -> always equal; generated region must agree
    # on a clear majority of positions
    agree = float(np.mean(got == base))
    assert agree > 0.5, f"token agreement {agree} vs fp32"


def test_quantized_streaming_matches_quantized_lockstep():
    """w8a8 params compose with the ring continuous-batching decode: the
    streaming output must be token-identical to the quantized lockstep
    greedy (both run the same quantized projections)."""
    from kotoba_whisper_tpu.decode.streaming import (
        StreamConfig,
        generate_greedy_streaming,
    )

    params = fuse_for_inference(whisper.init_params(jax.random.key(4), CFG))
    qparams = quantize_for_inference(params)
    rng = np.random.default_rng(5)
    mel = np.asarray(
        rng.standard_normal(
            (5, CFG.num_mel_bins, CFG.max_source_positions * 2)
        ).astype(np.float32)
        * 0.1
    )
    prompt = (ST.sot, ST.lang_begin + 6, ST.transcribe)
    opts = GenerateOptions(prompt_ids=prompt, max_length=12)
    base = np.asarray(generate_greedy(qparams, CFG, jnp.asarray(mel), opts, ST))
    got = generate_greedy_streaming(
        qparams, CFG, mel, opts, ST,
        stream=StreamConfig(batch=3, encode_batch=2, steps_per_round=4),
    )
    np.testing.assert_array_equal(got, base)
