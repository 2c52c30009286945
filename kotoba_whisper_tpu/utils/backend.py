"""Backend bootstrap guard.

Some environments route JAX to an out-of-process TPU plugin whose
registration can fail transiently (e.g. the chip is claimed by another
process). When that happens `jax.devices()` raises for a platform that was
force-selected but never registered. Pipeline stages are batch jobs that can
always make progress on CPU, so the drivers call `ensure_backend()` once:
try the configured platform, and on failure fall back to CPU with a loud
warning instead of dying (the reference's equivalent resilience is its
retry-forever loops, SURVEY.md §5.3).
"""
from __future__ import annotations

import sys


def ensure_backend(allow_cpu_fallback: bool = True) -> str:
    import jax

    try:
        return jax.devices()[0].platform
    except RuntimeError as e:
        if not allow_cpu_fallback:
            raise
        print(
            f"warning: configured JAX backend unavailable ({e}); "
            "falling back to CPU",
            file=sys.stderr,
        )
        jax.config.update("jax_platforms", "cpu")
        return jax.devices()[0].platform
