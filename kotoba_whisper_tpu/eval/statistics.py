"""Dataset / model statistics tools.

Counterparts of misc/get_data_statistics.py (:15-97 — per-dataset utterance
count, duration sum/mean, amplitude stats, token-length stats) and
misc/get_model_statistics.py (parameter counts; the table at
misc/model_statistics.csv — e.g. large-v3 = 1,543,490,560 params, which
models/whisper.py reproduces exactly).
"""
from __future__ import annotations

from typing import Any, Iterable

import numpy as np


def data_statistics(
    utterances: Iterable[tuple[np.ndarray, list[int] | None]],
    sampling_rate: int = 16000,
) -> dict[str, Any]:
    """(audio, label_ids) pairs -> the reference's statistics schema."""
    durations = []
    amplitudes = []
    token_lens = []
    for audio, labels in utterances:
        durations.append(len(audio) / sampling_rate)
        if len(audio):
            amplitudes.append(float(np.abs(audio).max()))
        if labels is not None:
            token_lens.append(len(labels))
    out: dict[str, Any] = {
        "num_utterances": len(durations),
        "duration_s_total": float(np.sum(durations)),
        "duration_s_mean": float(np.mean(durations)) if durations else 0.0,
        "duration_s_std": float(np.std(durations)) if durations else 0.0,
        "amplitude_max_mean": float(np.mean(amplitudes)) if amplitudes else 0.0,
    }
    if token_lens:
        out.update(
            token_length_mean=float(np.mean(token_lens)),
            token_length_max=int(np.max(token_lens)),
        )
    return out


def model_statistics(params: Any, name: str = "model") -> dict[str, Any]:
    from kotoba_whisper_tpu.models.whisper import param_count

    import jax

    leaves = jax.tree.leaves(params)
    return {
        "model": name,
        "n_parameters": param_count(params),
        "n_tensors": len(leaves),
        "bytes_fp32": 4 * param_count(params),
    }
