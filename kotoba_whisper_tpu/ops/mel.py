"""Batched on-device log-mel frontend.

Reproduces WhisperFeatureExtractor numerics (invocation sites:
run_pseudo_labelling.py:268, run_data_filtering.py:335-340): 16 kHz audio,
n_fft=400 periodic Hann, hop=160, center reflect padding, power spectrum,
slaney-scale/slaney-norm mel filterbank (80 or 128 bins), log10 with 1e-10
floor, per-utterance clamp at max-8, then (x+4)/4 — the reference computes
this per-utterance on CPU workers via `datasets.map` (CPU HOT LOOP #1,
SURVEY.md §3.1); here it is a batched on-device op.

TPU-first design: the 400-point DFT is expressed as a single real matmul
(frames @ [W_re | W_im], 400x402) so the whole frontend is two MXU matmuls
(DFT, then mel projection) plus fused elementwise — no scalar FFT loops, no
dynamic shapes. A Pallas fused variant lives in ops/mel_pallas.py.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from kotoba_whisper_tpu.core.config import FeatureConfig


# ---------------------------------------------------------------------------
# Filterbank construction (host-side, cached; numpy fp64 then cast)
# ---------------------------------------------------------------------------

def _hz_to_mel_slaney(freq):
    freq = np.asarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mels = freq / f_sp
    return np.where(
        freq >= min_log_hz,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels,
    )


def _mel_to_hz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    freqs = f_sp * mels
    return np.where(
        mels >= min_log_mel,
        min_log_hz * np.exp(logstep * (mels - min_log_mel)),
        freqs,
    )


@lru_cache(maxsize=8)
def mel_filterbank(
    n_freqs: int, n_mels: int, sampling_rate: int, fmin: float, fmax: float
) -> np.ndarray:
    """Triangular slaney-scale mel filterbank, slaney-normalized.

    Returns (n_freqs, n_mels) float32.
    """
    fft_freqs = np.linspace(0.0, sampling_rate / 2.0, n_freqs)
    mel_min = _hz_to_mel_slaney(fmin)
    mel_max = _hz_to_mel_slaney(fmax)
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    filter_freqs = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(filter_freqs)
    slopes = filter_freqs[np.newaxis, :] - fft_freqs[:, np.newaxis]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    # slaney area normalization
    enorm = 2.0 / (filter_freqs[2 : n_mels + 2] - filter_freqs[:n_mels])
    fb *= enorm[np.newaxis, :]
    return fb.astype(np.float32)


@lru_cache(maxsize=4)
def _dft_window_matrix(n_fft: int) -> np.ndarray:
    """Hann-windowed real-DFT matrix: (n_fft, 2*(n_fft//2+1)) fp32.

    Columns [0:n_bins] give Re(X_k), [n_bins:] give -Im(X_k) (sign is
    irrelevant — only |X|^2 is consumed). Folding the periodic Hann window
    into the matrix makes the frontend a single MXU matmul per frame block.
    """
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))
    k = np.arange(n_bins, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    w_re = np.cos(ang) * window[:, None]
    w_im = np.sin(ang) * window[:, None]
    return np.concatenate([w_re, w_im], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# The frontend op
# ---------------------------------------------------------------------------

def frame_signal(audio: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Center-padded (reflect) framing: (..., T) -> (..., 1 + T//hop, n_fft)."""
    pad = n_fft // 2
    x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = 1 + audio.shape[-1] // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[..., idx]


@partial(jax.jit, static_argnames=("cfg",))
def log_mel_spectrogram(audio: jax.Array, cfg: FeatureConfig = FeatureConfig()) -> jax.Array:
    """(B, n_samples) fp32 audio -> (B, n_mels, n_frames) fp32 log-mel.

    Expects audio already padded/trimmed to cfg.n_samples (the collator's
    job, matching feature_extractor pad-to-30 s). Matches HF
    `_np_extract_fbank_features` bit-for-bit at fp32 tolerance: drops the
    final STFT frame, clamps at per-utterance max-8, scales (x+4)/4.
    """
    if audio.ndim == 1:
        audio = audio[None]
    n_bins = cfg.n_fft // 2 + 1

    if jnp.issubdtype(audio.dtype, jnp.integer):
        # int16 PCM wire format (decode/pipeline.py wire_dtype="int16"):
        # the host ships the source 16-bit samples and the /32768
        # normalization that native/audio.cpp would have applied on host
        # happens here on device — bit-identical to the fp32 path for
        # PCM-sourced audio, at half the host->device transfer
        audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
    frames = frame_signal(audio.astype(jnp.float32), cfg.n_fft, cfg.hop_length)
    w = jnp.asarray(_dft_window_matrix(cfg.n_fft))
    # (B, F, n_fft) @ (n_fft, 2*n_bins) — the only FLOP-heavy op; MXU tiled.
    # HIGHEST precision: full-fp32 MXU passes; the frontend is ~1 GFLOP per
    # 30 s utterance, negligible next to the encoder, and parity with the
    # reference extractor requires fp32.
    spec = jnp.einsum(
        "bfn,nk->bfk", frames, w,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    power = spec[..., :n_bins] ** 2 + spec[..., n_bins:] ** 2

    fb = jnp.asarray(
        mel_filterbank(n_bins, cfg.n_mels, cfg.sampling_rate, cfg.fmin, cfg.fmax)
    )
    mel = jnp.einsum(
        "bfk,km->bfm", power, fb,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = log_spec[:, :-1, :]  # drop final frame (HF behavior)
    per_utt_max = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, per_utt_max - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.transpose(log_spec, (0, 2, 1))  # (B, n_mels, n_frames)


def pad_or_trim(audio: np.ndarray, n_samples: int) -> np.ndarray:
    """Host-side pad/trim to the 30 s window (feature_extractor.pad)."""
    t = audio.shape[-1]
    if t >= n_samples:
        return audio[..., :n_samples]
    pad = [(0, 0)] * (audio.ndim - 1) + [(0, n_samples - t)]
    return np.pad(audio, pad)
