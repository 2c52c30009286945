"""Logit-parity tests: our functional Whisper vs HF torch implementation.

A randomly-initialized small HF WhisperForConditionalGeneration (offline) is
the numeric oracle for the forward semantics the reference relies on
(run_distillation.py:466-498, 628-649). Weights are imported through
models/hf_import.py, so these tests cover both the name mapping and the math.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
trf = pytest.importorskip("transformers")

import jax.numpy as jnp

from kotoba_whisper_tpu.models import hf_import, whisper
from kotoba_whisper_tpu.core.config import WhisperConfig


def small_cfgs(vocab=1017, mels=80):
    cfg = WhisperConfig(
        vocab_size=vocab,
        num_mel_bins=mels,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_layers=3,
        decoder_attention_heads=4,
        encoder_ffn_dim=96,
        decoder_ffn_dim=96,
        max_source_positions=64,
        max_target_positions=32,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=1,
        decoder_start_token_id=2,
    )
    hf_cfg = trf.WhisperConfig(
        vocab_size=cfg.vocab_size,
        num_mel_bins=cfg.num_mel_bins,
        d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers,
        encoder_attention_heads=cfg.encoder_attention_heads,
        decoder_layers=cfg.decoder_layers,
        decoder_attention_heads=cfg.decoder_attention_heads,
        encoder_ffn_dim=cfg.encoder_ffn_dim,
        decoder_ffn_dim=cfg.decoder_ffn_dim,
        max_source_positions=cfg.max_source_positions,
        max_target_positions=cfg.max_target_positions,
        pad_token_id=cfg.pad_token_id,
        bos_token_id=cfg.bos_token_id,
        eos_token_id=cfg.eos_token_id,
        decoder_start_token_id=cfg.decoder_start_token_id,
        attention_dropout=0.0,
        dropout=0.0,
        activation_dropout=0.0,
    )
    return cfg, hf_cfg


@pytest.fixture(scope="module")
def models():
    cfg, hf_cfg = small_cfgs()
    torch.manual_seed(0)
    hf_model = trf.WhisperForConditionalGeneration(hf_cfg).eval()
    params = hf_import.params_from_hf_state_dict(hf_model.state_dict(), cfg)
    return cfg, hf_model, params


def test_encoder_parity(models, rng):
    cfg, hf_model, params = models
    mel = rng.standard_normal(
        (2, cfg.num_mel_bins, 2 * cfg.max_source_positions)
    ).astype(np.float32)
    with torch.no_grad():
        golden = hf_model.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    ours = np.asarray(whisper.encode(params, cfg, jnp.asarray(mel)))
    np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=1e-3)


def test_full_forward_parity(models, rng):
    cfg, hf_model, params = models
    b, t = 2, 12
    mel = rng.standard_normal(
        (b, cfg.num_mel_bins, 2 * cfg.max_source_positions)
    ).astype(np.float32)
    ids = rng.integers(0, cfg.vocab_size, (b, t)).astype(np.int64)
    with torch.no_grad():
        golden = hf_model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(ids),
        ).logits.numpy()
    ours, _ = whisper.forward(params, cfg, jnp.asarray(mel), jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), golden, atol=3e-4, rtol=1e-3)


def test_incremental_decode_matches_full(models, rng):
    """KV-cached step-by-step decode == full prefill logits."""
    cfg, _, params = models
    b, t = 2, 9
    mel = rng.standard_normal(
        (b, cfg.num_mel_bins, 2 * cfg.max_source_positions)
    ).astype(np.float32)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)).astype(np.int32))

    enc = whisper.encode(params, cfg, jnp.asarray(mel))
    full = whisper.decode(params, cfg, ids, enc)

    cache = whisper.init_cache(params, cfg, enc, capacity=16)
    step_logits = []
    for i in range(t):
        lg, cache = whisper.decode(params, cfg, ids[:, i : i + 1], cache=cache)
        step_logits.append(np.asarray(lg)[:, 0])
    inc = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(inc, np.asarray(full), atol=2e-4, rtol=1e-3)


def test_prefill_with_cache_matches_full(models, rng):
    """Multi-token block prefill through the cache path == full decode."""
    cfg, _, params = models
    b, t = 1, 6
    mel = rng.standard_normal(
        (b, cfg.num_mel_bins, 2 * cfg.max_source_positions)
    ).astype(np.float32)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)).astype(np.int32))
    enc = whisper.encode(params, cfg, jnp.asarray(mel))
    full = whisper.decode(params, cfg, ids, enc)
    cache = whisper.init_cache(params, cfg, enc, capacity=16)
    lg, cache = whisper.decode(params, cfg, ids, cache=cache)
    np.testing.assert_allclose(
        np.asarray(lg), np.asarray(full), atol=2e-4, rtol=1e-3
    )
    assert int(cache.length) == t


def test_ce_loss_matches_hf(models, rng):
    cfg, hf_model, params = models
    b, t = 2, 8
    mel = rng.standard_normal(
        (b, cfg.num_mel_bins, 2 * cfg.max_source_positions)
    ).astype(np.float32)
    labels = rng.integers(0, cfg.vocab_size, (b, t)).astype(np.int64)
    labels[0, -3:] = -100
    with torch.no_grad():
        golden = hf_model(
            input_features=torch.from_numpy(mel),
            labels=torch.from_numpy(labels),
        ).loss.item()
    dec_ids = whisper.shift_labels_right(
        jnp.asarray(labels), cfg.decoder_start_token_id, cfg.pad_token_id
    )
    logits, _ = whisper.forward(params, cfg, jnp.asarray(mel), dec_ids)
    ours = float(whisper.ce_loss(logits, jnp.asarray(labels)))
    np.testing.assert_allclose(ours, golden, atol=1e-4, rtol=1e-4)
