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


def _lame_encode_mp3(pcm16: np.ndarray, sr: int = 16000, brate: int = 64) -> bytes:
    """Encode mono int16 PCM to MP3 with the system lame library (test
    fixture generator — the decoder under test binds system libmpg123)."""
    import ctypes

    try:
        lame = ctypes.CDLL("libmp3lame.so.0")
    except OSError:
        pytest.skip("libmp3lame not available for fixture generation")
    lame.lame_init.restype = ctypes.c_void_p
    gf = ctypes.c_void_p(lame.lame_init())
    lame.lame_set_in_samplerate(gf, sr)
    lame.lame_set_num_channels(gf, 1)
    lame.lame_set_mode(gf, 3)  # MONO
    lame.lame_set_brate(gf, brate)
    assert lame.lame_init_params(gf) >= 0
    out = ctypes.create_string_buffer(len(pcm16) * 4 + (1 << 14))
    lame.lame_encode_buffer.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
    ]
    n = lame.lame_encode_buffer(
        gf, pcm16.ctypes.data_as(ctypes.c_void_p), None, len(pcm16),
        out, len(out),
    )
    assert n > 0
    flush = ctypes.create_string_buffer(1 << 16)
    lame.lame_encode_flush.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
    ]
    n2 = lame.lame_encode_flush(gf, flush, len(flush))
    lame.lame_close(gf)
    return out.raw[:n] + flush.raw[:n2]


def test_mp3_decode_tone():
    """MP3 decode (system libmpg123 via native/audio.cpp): a lame-encoded
    440 Hz tone decodes to a 440 Hz tone at the right rate/duration
    (common_voice/ESB are MP3 — run_pseudo_labelling.py:261-263 path)."""
    sr = 16000
    t = np.arange(sr) / sr
    pcm = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    mp3 = _lame_encode_mp3(pcm, sr)
    assert mp3[:1] == b"\xff" or mp3[:3] == b"ID3"

    audio, rate = native.decode_audio(mp3, sr)
    assert rate == sr
    # codec delay pads the ends; duration within 0.2 s of the original
    assert abs(len(audio) / sr - 1.0) < 0.2
    mid = audio[len(audio) // 4 : len(audio) // 4 + 8192]
    spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
    peak = np.argmax(spec) * sr / len(mid)
    assert abs(peak - 440) < 10
    assert 0.2 < float(np.sqrt((audio**2).mean())) < 0.5


def test_mp3_decode_resampled_44k_stereoish():
    """44.1 kHz MP3 resamples to 16 kHz through the same entry point."""
    sr = 44100
    t = np.arange(sr) / sr
    pcm = (0.4 * np.sin(2 * np.pi * 1000 * t) * 32767).astype(np.int16)
    mp3 = _lame_encode_mp3(pcm, sr, brate=128)
    audio, rate = native.decode_audio(mp3, 16000)
    assert rate == 44100  # native rate reported
    assert abs(len(audio) / 16000 - 1.0) < 0.2
    mid = audio[len(audio) // 4 : len(audio) // 4 + 8192]
    spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
    peak = np.argmax(spec) * 16000 / len(mid)
    assert abs(peak - 1000) < 20


def test_mp3_garbage_rejected():
    with pytest.raises(ValueError):
        native.decode_audio(b"\xff\xe3" + b"\x00" * 100, 16000)
