"""Golden tests: log-mel frontend vs HF WhisperFeatureExtractor.

The HF extractor is constructed offline (no hub access) purely as a numeric
oracle for the behavior the reference invokes at run_pseudo_labelling.py:268.
"""
import numpy as np
import pytest

from kotoba_whisper_tpu.core.config import FeatureConfig
from kotoba_whisper_tpu.ops.mel import (
    log_mel_spectrogram,
    mel_filterbank,
    pad_or_trim,
)


def _hf_extractor(n_mels):
    trf = pytest.importorskip("transformers")
    return trf.WhisperFeatureExtractor(feature_size=n_mels)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_filterbank_matches_hf(n_mels):
    hf = _hf_extractor(n_mels)
    ours = mel_filterbank(201, n_mels, 16000, 0.0, 8000.0)
    np.testing.assert_allclose(ours, hf.mel_filters, atol=1e-6)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_log_mel_matches_hf(rng, n_mels):
    hf = _hf_extractor(n_mels)
    cfg = FeatureConfig(n_mels=n_mels)
    # 7.3 s of noise-ish audio with structure, padded to 30 s
    t = np.linspace(0, 7.3, int(16000 * 7.3), dtype=np.float32)
    audio = (
        0.3 * np.sin(2 * np.pi * 440 * t)
        + 0.1 * np.sin(2 * np.pi * 1333 * t)
        + 0.05 * rng.standard_normal(t.shape)
    ).astype(np.float32)

    golden = hf(audio, sampling_rate=16000, return_tensors="np")["input_features"][0]
    ours = np.asarray(
        log_mel_spectrogram(pad_or_trim(audio[None], cfg.n_samples), cfg)
    )[0]
    assert ours.shape == golden.shape == (n_mels, 3000)
    np.testing.assert_allclose(ours, golden, atol=2e-4)


def test_log_mel_batch_independence(rng):
    cfg = FeatureConfig()
    a = rng.standard_normal((2, cfg.n_samples)).astype(np.float32)
    batched = np.asarray(log_mel_spectrogram(a, cfg))
    single0 = np.asarray(log_mel_spectrogram(a[:1], cfg))[0]
    np.testing.assert_allclose(batched[0], single0, atol=1e-6)


def test_pad_or_trim():
    cfg = FeatureConfig()
    short = np.ones((1, 100), np.float32)
    assert pad_or_trim(short, cfg.n_samples).shape == (1, cfg.n_samples)
    long = np.ones((1, cfg.n_samples + 5), np.float32)
    assert pad_or_trim(long, cfg.n_samples).shape == (1, cfg.n_samples)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_pallas_mel_matches_xla(rng, n_mels):
    """The fused Pallas frontend (ops/mel_pallas.py) is a drop-in equivalent
    of the XLA-matmul path, which is itself HF-golden-tested above."""
    from kotoba_whisper_tpu.ops.mel_pallas import log_mel_spectrogram_pallas

    cfg = FeatureConfig(n_mels=n_mels)
    audio = (rng.standard_normal((2, cfg.n_samples)) * 0.1).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(audio, cfg))
    got = np.asarray(log_mel_spectrogram_pallas(audio, cfg))
    assert got.shape == ref.shape == (2, n_mels, 3000)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_int16_pcm_wire_bit_identical(rng):
    """int16 PCM input (decode/pipeline.py wire_dtype="int16") produces a
    bit-identical log-mel to the fp32 pcm/32768 path — the on-device
    normalization is the exact op native/audio.cpp applies on host."""
    import jax.numpy as jnp

    cfg = FeatureConfig()
    pcm = rng.integers(-32768, 32768, (2, cfg.n_samples)).astype(np.int16)
    f32 = pcm.astype(np.float32) / 32768.0
    ref = np.asarray(log_mel_spectrogram(f32, cfg))
    got = np.asarray(log_mel_spectrogram(jnp.asarray(pcm), cfg))
    np.testing.assert_array_equal(got, ref)


def test_pipeline_int16_wire_matches_float(rng):
    """AsrPipeline(wire_dtype="int16") transcribes PCM-sourced audio
    identically to the fp32 wire (the conversion round-trips exactly)."""
    import dataclasses

    import jax

    from kotoba_whisper_tpu.core.config import PRESETS
    from kotoba_whisper_tpu.decode.pipeline import AsrPipeline
    from kotoba_whisper_tpu.models import whisper
    from kotoba_whisper_tpu.tokenizer.whisper_tokenizer import WhisperTokenizer

    cfg = PRESETS["test-byte"]
    tok = WhisperTokenizer.byte_vocab(cfg.vocab_size)
    params = whisper.init_params(jax.random.key(0), cfg)
    pcm = rng.integers(-4000, 4000, (40000,)).astype(np.int16)
    audio = pcm.astype(np.float32) / 32768.0
    pipe = AsrPipeline(
        params=params, cfg=cfg, tok=tok, max_length=16,
    )
    ref = pipe(audio)
    pipe16 = dataclasses.replace(pipe, wire_dtype="int16")
    got = pipe16(audio)
    assert got["text"] == ref["text"]
    assert got["chunks"] == ref["chunks"]
