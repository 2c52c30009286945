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

import os
import sys


def enable_compilation_cache(
    cache_dir: str | None = None, min_compile_secs: float = 2.0
) -> None:
    """Persistent XLA compilation cache: large-model TPU compiles cost
    minutes through this environment's remote-compile service; the cache
    makes re-runs (pipeline stages, bench, resumed jobs) near-instant.

    OPT-IN: set KWT_COMPILE_CACHE=on (default dir ~/.cache/kwt_xla) or to a
    directory path. Off by default because this environment's remote-compile
    service has been observed to wedge on the largest cache-serialized
    programs; on standard TPU hosts it is safe to enable."""
    import jax

    env = os.environ.get("KWT_COMPILE_CACHE")
    if not env or env == "off":
        return
    cache_dir = (
        (env if env != "on" else None)
        or cache_dir
        or os.path.expanduser("~/.cache/kwt_xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception as e:  # cache is an optimization, never fatal
        print(f"warning: compilation cache unavailable: {e}", file=sys.stderr)


def apply_platform_pin() -> None:
    """Apply KWT_PLATFORM / KWT_NUM_CPU_DEVICES config pins WITHOUT
    touching devices. Multi-process drivers need the pin applied before
    `jax.distributed.initialize` (which must itself run before the first
    device query), so this is split out of ensure_backend."""
    import jax

    pin = os.environ.get("KWT_PLATFORM")
    if pin:
        jax.config.update("jax_platforms", pin)
        n_dev = os.environ.get("KWT_NUM_CPU_DEVICES")
        if pin == "cpu" and n_dev:
            jax.config.update("jax_num_cpu_devices", int(n_dev))


def ensure_backend(allow_cpu_fallback: bool = True) -> str:
    """Returns the platform actually in use. KWT_PLATFORM=cpu (or any
    platform string) pins the backend explicitly — needed because this
    environment's TPU plugin force-selects itself at interpreter start, so
    a plain JAX_PLATFORMS env var is ignored; pipeline stages that should
    run on host CPU (filtering, smoke runs of recipes) set this."""
    import jax

    apply_platform_pin()
    enable_compilation_cache()
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
