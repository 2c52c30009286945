"""Fused-projection inference transform: lossless parity with the unfused
model across encode, train-mode decode, and cached decode."""
import numpy as np

import jax
import jax.numpy as jnp

from kotoba_whisper_tpu.models import whisper
from kotoba_whisper_tpu.models.optimized import fuse_for_inference
from tests.test_train import tiny_cfg


def test_fused_params_match_unfused(rng):
    cfg = tiny_cfg()
    params = whisper.init_params(jax.random.key(7), cfg)
    fused = fuse_for_inference(params)

    mel = jnp.asarray(
        rng.standard_normal((2, cfg.num_mel_bins, 2 * cfg.max_source_positions)),
        jnp.float32,
    )
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (2, 7)), jnp.int32)

    enc_a = whisper.encode(params, cfg, mel)
    enc_b = whisper.encode(fused, cfg, mel)
    np.testing.assert_allclose(np.asarray(enc_a), np.asarray(enc_b), atol=1e-5)

    full_a = whisper.decode(params, cfg, ids, enc_a)
    full_b = whisper.decode(fused, cfg, ids, enc_b)
    np.testing.assert_allclose(np.asarray(full_a), np.asarray(full_b), atol=1e-4)

    cache_a = whisper.init_cache(params, cfg, enc_a, capacity=12)
    cache_b = whisper.init_cache(fused, cfg, enc_b, capacity=12)
    np.testing.assert_allclose(
        np.asarray(cache_a.cross_k), np.asarray(cache_b.cross_k), atol=1e-5
    )
    la, cache_a = whisper.decode(params, cfg, ids[:, :4], cache=cache_a)
    lb, cache_b = whisper.decode(fused, cfg, ids[:, :4], cache=cache_b)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-4)
