"""Metric logging: JSONL sink of record + optional tracker fan-out.

Reference behaviors (SURVEY.md §5.5): `accelerator.log` with metric names
prefixed `train/...` (log_metric helper run_distillation.py:275-292), eval
metrics appended to JSONL files; wandb/tensorboard optional and disabled by
env (`WANDB_DISABLED`, script/distil_whisper_v2.0.sh:142). Here the JSONL
sink is the source of truth; wandb/TB attach when importable and enabled.
Also adds the TPU-first throughput gauge: audio-seconds/s/chip.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Mapping


class MetricLogger:
    def __init__(
        self,
        output_dir: str | None,
        run_name: str = "run",
        wandb_project: str | None = None,
    ):
        # output_dir=None: a no-op sink for non-main ranks of a
        # multi-process job (rank-aware verbosity,
        # run_distillation.py:404-407)
        self.path = None
        if output_dir is not None:
            os.makedirs(output_dir, exist_ok=True)
            self.path = os.path.join(output_dir, f"metrics.{run_name}.jsonl")
        self._wandb = None
        if wandb_project and os.environ.get("WANDB_DISABLED", "").lower() not in (
            "1", "true",
        ):
            try:
                import wandb

                self._wandb = wandb.init(project=wandb_project, name=run_name)
            except Exception:
                self._wandb = None

    def log(self, metrics: Mapping[str, Any], step: int, prefix: str = "train") -> None:
        if self.path is None:
            return
        record = {f"{prefix}/{k}": _to_py(v) for k, v in metrics.items()}
        record["step"] = step
        record["time"] = time.time()
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log(record, step=step)

    def close(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()


def _to_py(v: Any):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


def append_jsonl(path: str, record: Mapping[str, Any]) -> None:
    """Append-only metric record (run_short_form_eval.py:227-235 pattern)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(record, ensure_ascii=False) + "\n")


class Throughput:
    """audio-seconds/s/chip gauge with async-dispatch-aware timing."""

    def __init__(self, n_chips: int = 1):
        self.n_chips = n_chips
        self._t0: float | None = None
        self._audio_s = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()
        self._audio_s = 0.0

    def add(self, audio_seconds: float) -> None:
        self._audio_s += audio_seconds

    def rate(self) -> float:
        if self._t0 is None:
            return 0.0
        dt = time.perf_counter() - self._t0
        return self._audio_s / dt / self.n_chips if dt > 0 else 0.0
