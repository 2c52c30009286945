"""Latency benchmark harness.

Counterpart of run_speed_eval.py: deterministic dummy audio
(`generate_dummy_audio` :14-17 — uniform noise at fixed seed) for durations
{10, 30, 60, 300} s, n-trial mean/std with warmup discard (:73-79), records
appended to `eval_pipeline/runtime_pipeline.jsonl` (:82-88).
"""
from __future__ import annotations

import time
from typing import Callable, Sequence

import numpy as np

from kotoba_whisper_tpu.train.logging import append_jsonl

DEFAULT_DURATIONS = (10, 30, 60, 300)


def generate_dummy_audio(duration_s: float, sampling_rate: int = 16000, seed: int = 42):
    rng = np.random.default_rng(seed)
    return (rng.uniform(-1, 1, int(duration_s * sampling_rate))).astype(np.float32)


def evaluate_speed(
    transcribe_fn: Callable[[np.ndarray], str],
    *,
    model_name: str,
    durations: Sequence[float] = DEFAULT_DURATIONS,
    n_trials: int = 5,
    n_warmup: int = 2,
    output_path: str = "eval_pipeline/runtime_pipeline.jsonl",
    attn_impl: str = "pallas",
    extra: dict | None = None,
) -> list[dict]:
    """Rows carry BOTH this framework's short keys (mean/std/trials) and
    the reference's exact field names ("time (mean)"/"time (std)"/
    "time (all)" + device, run_speed_eval.py:80) so the committed JSONL
    diffs structurally against eval_pipeline/runtime_pipeline.jsonl."""
    records = []
    for duration in durations:
        audio = generate_dummy_audio(duration)
        for _ in range(n_warmup):
            transcribe_fn(audio)
        times = []
        for _ in range(n_trials):
            t0 = time.perf_counter()
            transcribe_fn(audio)
            times.append(time.perf_counter() - t0)
        rec = {
            "model": model_name,
            "attention": attn_impl,
            "device": _device_name(),
            "duration": duration,
            "mean": float(np.mean(times)),
            "std": float(np.std(times)),
            "trials": n_trials,
            "time (mean)": float(np.mean(times)),
            "time (std)": float(np.std(times)),
            "time (all)": [float(t) for t in times],
            **(extra or {}),
        }
        append_jsonl(output_path, rec)
        records.append(rec)
    return records


def _device_name() -> str:
    try:
        import jax

        d = jax.devices()[0]
        return f"{d.platform}:{d.id}"
    except Exception:  # pragma: no cover - device probe is best-effort
        return "unknown"
