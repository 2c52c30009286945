"""Scaling-efficiency report: throughput at 1 chip vs N-chip DP meshes.

The BASELINE.json north star requires pseudo-labelling audio-s/s/chip
reported at 1 chip / 1 host / N hosts with >=0.9 scaling efficiency. This
harness runs the same jitted pipeline over growing data-parallel meshes and
reports efficiency = (rate_N / N) / rate_1. On CI the meshes are virtual
CPU devices (numbers are not meaningful there, but the sharded program path
is identical); on hardware the same entry points produce the real report.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable

import jax
import numpy as np

from kotoba_whisper_tpu.core.mesh import MeshConfig, build_mesh
from kotoba_whisper_tpu.parallel import sharded


@dataclass
class ScalingPoint:
    n_devices: int
    audio_s_per_s: float
    per_chip: float
    efficiency: float


def scaling_report(
    make_pipeline: Callable[[object], Callable[[object], object]],
    make_batch: Callable[[int], dict],
    audio_seconds_per_item: float,
    device_counts: list[int] | None = None,
    n_trials: int = 3,
) -> list[ScalingPoint]:
    """make_pipeline(mesh) -> fn(batch)->outputs (jitted, batch sharded over
    'data'); make_batch(global_batch_rows) -> host arrays."""
    all_devices = jax.devices()
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8) if n <= len(all_devices)]

    points: list[ScalingPoint] = []
    base_rate = None
    for n in device_counts:
        mesh = build_mesh(MeshConfig(data=n, model=1), all_devices[:n])

        def fence(out):
            # some remote-attached TPU runtimes do not fence device-
            # resident-input programs on block_until_ready alone (CLAUDE.md
            # / DESIGN.md calibration note): read one element back
            leaf = jax.tree.leaves(out)[0]
            np.asarray(leaf).ravel()[:1]
            return out

        with mesh:
            fn = make_pipeline(mesh)
            batch = sharded.place_batch(mesh, make_batch(n))
            fence(fn(batch))  # compile
            times = []
            for _ in range(n_trials):
                t0 = time.perf_counter()
                fence(fn(batch))
                times.append(time.perf_counter() - t0)
            dt = min(times)
        rows = jax.tree.leaves(batch)[0].shape[0]
        rate = rows * audio_seconds_per_item / dt
        per_chip = rate / n
        if base_rate is None:
            base_rate = per_chip
        points.append(
            ScalingPoint(n, rate, per_chip, per_chip / base_rate)
        )
    return points
