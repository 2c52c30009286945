"""Debug / sanity utilities (SURVEY §5.2).

The reference has no race detection or sanitizers; its correctness relies
on barriers. This framework is deterministic-by-construction (pjit
programs; tests/test_determinism.py), and adds an opt-in debug mode:

  - `debug_mode()`: enables jax_debug_nans + disables jit donation-hiding
    so NaN origins surface with stack traces;
  - `tree_checksum` / `assert_params_in_sync`: cross-host checksum of a
    param pytree — catches desynchronized replicated state in multi-host
    runs (e.g. host-dependent data ordering bugs) before it corrupts a
    training run.
"""
from __future__ import annotations

import contextlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False):
    ctx = contextlib.ExitStack()
    with ctx:
        if nans:
            ctx.enter_context(jax.debug_nans(True))
        if disable_jit:
            ctx.enter_context(jax.disable_jit())
        yield


def tree_checksum(tree: Any) -> float:
    """Order-stable scalar fingerprint of a pytree (sum of per-leaf L1
    norms, fp64 on host). Cheap enough to run every few hundred steps."""
    total = 0.0
    for leaf in jax.tree.leaves(tree):
        total += float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))
    return total


def assert_params_in_sync(params: Any, atol: float = 1e-3) -> float:
    """All hosts must hold the same replicated params: allgather the
    checksum and compare. Returns the checksum. No-op on single host."""
    checksum = tree_checksum(params)
    if jax.process_count() == 1:
        return checksum
    from kotoba_whisper_tpu.parallel.multihost import all_gather_host

    gathered = all_gather_host(np.asarray([checksum], np.float64))
    if not np.allclose(gathered, gathered[0], atol=atol, rtol=1e-7):
        raise AssertionError(
            f"replicated params desynchronized across hosts: {gathered}"
        )
    return checksum


def find_nonfinite(tree: Any) -> list[str]:
    """Paths of leaves containing NaN/Inf (post-mortem helper)."""
    bad = []

    def visit(path, leaf):
        if not bool(jnp.all(jnp.isfinite(leaf.astype(jnp.float32)))):
            bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(visit, tree)
    return bad
