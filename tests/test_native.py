"""Native module tests: edit distance (vs pure-python oracle) and audio
decode/resample (WAV synthesis + spectral checks on the resampler)."""
import numpy as np
import pytest

from kotoba_whisper_tpu.utils import native


def _py_lev(a, b):
    n, m = len(a), len(b)
    dp = list(range(m + 1))
    for i in range(1, n + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, m + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[m]


def test_levenshtein_matches_oracle(rng):
    for _ in range(50):
        a = rng.integers(0, 5, rng.integers(0, 12)).astype(np.uint32)
        b = rng.integers(0, 5, rng.integers(0, 12)).astype(np.uint32)
        assert native.levenshtein(a, b) == _py_lev(list(a), list(b))


def test_levenshtein_batch(rng):
    hyps = [rng.integers(0, 8, rng.integers(0, 30)).astype(np.uint32) for _ in range(40)]
    refs = [rng.integers(0, 8, rng.integers(1, 30)).astype(np.uint32) for _ in range(40)]
    dist, ref_len = native.levenshtein_batch(hyps, refs)
    for i in range(40):
        assert dist[i] == _py_lev(list(hyps[i]), list(refs[i]))
        assert ref_len[i] == len(refs[i])


def _wav_bytes(audio: np.ndarray, sr: int, bits=16) -> bytes:
    import struct

    pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, 1,
        sr, sr * 2, 2, 16, b"data", len(pcm),
    )
    return hdr + pcm


def test_wav_decode_roundtrip(rng):
    sr = 16000
    audio = np.clip(rng.standard_normal(sr) * 0.3, -0.99, 0.99).astype(np.float32)
    out, rate = native.decode_audio(_wav_bytes(audio, sr), target_rate=16000)
    assert rate == sr
    assert out.shape == audio.shape
    # int16 quantization (truncation) + 32767/32768 scale mismatch
    np.testing.assert_allclose(out, audio, atol=1e-4)


def test_wav_decode_resampled():
    sr = 48000
    t = np.arange(sr, dtype=np.float32) / sr
    audio = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out, rate = native.decode_audio(_wav_bytes(audio, sr), target_rate=16000)
    assert rate == sr
    assert abs(len(out) - 16000) <= 2
    # the 440 Hz tone must survive resampling: check dominant frequency
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = np.argmax(spec) * 16000 / len(out)
    assert abs(peak_hz - 440) < 5


def test_resample_preserves_tone():
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in, dtype=np.float32) / sr_in
    audio = 0.5 * np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    out = native.resample(audio, sr_in, sr_out)
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = np.argmax(spec) * sr_out / len(out)
    assert abs(peak_hz - 1000) < 10
    # energy retained within 1 dB
    rms_in, rms_out = np.sqrt((audio**2).mean()), np.sqrt((out**2).mean())
    assert abs(20 * np.log10(rms_out / rms_in)) < 1.0


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        native.decode_audio(b"not audio at all", 16000)
