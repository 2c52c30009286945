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


def test_int8_kv_cache_decode_close_to_fp32(rng):
    """int8 per-row-quantized KV decode: logits close to fp32 path and
    greedy tokens identical on a well-separated model."""
    import jax

    from kotoba_whisper_tpu.models import whisper
    from tests.test_train import tiny_cfg

    cfg = tiny_cfg()
    params = whisper.init_params(jax.random.key(2), cfg)
    mel = jnp.asarray(
        rng.standard_normal((2, cfg.num_mel_bins, 2 * cfg.max_source_positions)),
        jnp.float32,
    )
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (2, 6)), jnp.int32)
    enc = whisper.encode(params, cfg, mel)

    cache_f = whisper.init_cache(params, cfg, enc, capacity=12)
    cache_q = whisper.init_cache(params, cfg, enc, capacity=12, kv_dtype="int8")
    assert cache_q.is_int8 and not cache_f.is_int8
    assert cache_q.cross_k.dtype == jnp.int8

    # stepwise decode through both caches
    lf = lq = None
    for i in range(6):
        lf, cache_f = whisper.decode(params, cfg, ids[:, i : i + 1], cache=cache_f)
        lq, cache_q = whisper.decode(params, cfg, ids[:, i : i + 1], cache=cache_q)
    lf = np.asarray(lf)[:, 0]
    lq = np.asarray(lq)[:, 0]
    # int8 KV introduces small perturbations; logits stay close and the
    # argmax agrees
    np.testing.assert_allclose(lq, lf, atol=0.08, rtol=0.05)
    np.testing.assert_array_equal(lq.argmax(-1), lf.argmax(-1))


def test_per_head_scale_fold_is_exact(rng):
    """Per-(row, head) scales fold EXACTLY into the block-diagonal decode
    attention: quantized-KV decode with folded scales == dense attention
    over the explicitly dequantized K/V (float tolerance only — the fold
    itself adds no approximation beyond the rounding already in K/V)."""
    from kotoba_whisper_tpu.models.whisper import quantize_kv_heads

    b, t, h, hd = 2, 96, 4, 64
    q = jnp.asarray(rng.standard_normal((b, h, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h * hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h * hd)), jnp.float32)
    kq, ks = quantize_kv_heads(k, h, jnp.int4)
    vq, vs = quantize_kv_heads(v, h, jnp.int4)
    assert kq.dtype == jnp.int4 and ks.shape == (b, t, h)

    folded = decode_attention_reference(
        q, kq, vq, jnp.asarray(t), n_heads=h, k_scale=ks, v_scale=vs
    )

    def deq(vals, scale):
        x = np.asarray(vals, np.float32).reshape(b, t, h, hd)
        return jnp.asarray(
            (x * np.asarray(scale, np.float32)[..., None]).reshape(b, t, h * hd)
        )

    dense = decode_attention_reference(
        q, deq(kq, ks), deq(vq, vs), jnp.asarray(t), n_heads=h
    )
    np.testing.assert_allclose(
        np.asarray(folded), np.asarray(dense), atol=3e-5, rtol=1e-4
    )


def test_int4_kv_cache_decode_close_to_fp32(rng):
    """int4 cross-KV (per-head scale groups): logits as close to fp32 as
    the int8 per-row path, argmax identical."""
    import jax

    from kotoba_whisper_tpu.models import whisper
    from tests.test_train import tiny_cfg

    cfg = tiny_cfg()
    params = whisper.init_params(jax.random.key(2), cfg)
    mel = jnp.asarray(
        rng.standard_normal((2, cfg.num_mel_bins, 2 * cfg.max_source_positions)),
        jnp.float32,
    )
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (2, 6)), jnp.int32)
    enc = whisper.encode(params, cfg, mel)

    cache_f = whisper.init_cache(params, cfg, enc, capacity=12)
    cache_q = whisper.init_cache(params, cfg, enc, capacity=12, kv_dtype="int4")
    assert cache_q.is_quantized and cache_q.per_head_scales
    assert cache_q.cross_k.dtype == jnp.int4
    assert cache_q.cross_k_scale.shape[-1] == cfg.decoder_attention_heads

    lf = lq = None
    for i in range(6):
        lf, cache_f = whisper.decode(params, cfg, ids[:, i : i + 1], cache=cache_f)
        lq, cache_q = whisper.decode(params, cfg, ids[:, i : i + 1], cache=cache_q)
    lf = np.asarray(lf)[:, 0]
    lq = np.asarray(lq)[:, 0]
    np.testing.assert_allclose(lq, lf, atol=0.08, rtol=0.05)
    np.testing.assert_array_equal(lq.argmax(-1), lf.argmax(-1))


def test_int4_prefill_path(rng):
    """Multi-token prefill through an int4 cache (per-head dequant)."""
    import jax

    from kotoba_whisper_tpu.models import whisper
    from tests.test_train import tiny_cfg

    cfg = tiny_cfg()
    params = whisper.init_params(jax.random.key(2), cfg)
    mel = jnp.asarray(
        rng.standard_normal((1, cfg.num_mel_bins, 2 * cfg.max_source_positions)),
        jnp.float32,
    )
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (1, 5)), jnp.int32)
    enc = whisper.encode(params, cfg, mel)
    golden = whisper.decode(params, cfg, ids, enc)
    cache_q = whisper.init_cache(params, cfg, enc, capacity=12, kv_dtype="int4")
    lq, cache_q = whisper.decode(params, cfg, ids, cache=cache_q)
    np.testing.assert_allclose(
        np.asarray(lq), np.asarray(golden), atol=0.08, rtol=0.05
    )
    assert int(cache_q.length) == 5


def test_int8_prefill_path(rng):
    """Multi-token prefill through an int8 cache (dequantized attention)."""
    import jax

    from kotoba_whisper_tpu.models import whisper
    from tests.test_train import tiny_cfg

    cfg = tiny_cfg()
    params = whisper.init_params(jax.random.key(2), cfg)
    mel = jnp.asarray(
        rng.standard_normal((1, cfg.num_mel_bins, 2 * cfg.max_source_positions)),
        jnp.float32,
    )
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (1, 5)), jnp.int32)
    enc = whisper.encode(params, cfg, mel)
    golden = whisper.decode(params, cfg, ids, enc)
    cache_q = whisper.init_cache(params, cfg, enc, capacity=12, kv_dtype="int8")
    lq, cache_q = whisper.decode(params, cfg, ids, cache=cache_q)
    np.testing.assert_allclose(
        np.asarray(lq), np.asarray(golden), atol=0.08, rtol=0.05
    )
    assert int(cache_q.length) == 5
