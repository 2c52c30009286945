"""Sharded execution helpers: place params/batches on a mesh and build
pjit-compiled train/inference steps.

The reference's distributed layer is accelerate/DDP (SURVEY.md §2.3); here
parallelism is declarative: params get PartitionSpecs from core/mesh.py rules
(2-D data×model), batches shard over the data axis, and XLA inserts all
collectives (grad psum over ICI, all-gathers for model-sharded matmuls).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kotoba_whisper_tpu.core import mesh as meshlib


def place_params(mesh: Mesh, params: Any, model_sharded: bool = False) -> Any:
    """Device-put params: replicated (pure DP) or model-axis sharded (TP)."""
    if model_sharded:
        shardings = meshlib.shardings_for_params(mesh, params)
    else:
        shardings = jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    return jax.device_put(params, shardings)


def place_batch(mesh: Mesh, batch: Any) -> Any:
    """Shard batch leaves over the data axis (leading dim).

    Single-process: a device_put of the host-built global batch.
    Multi-process (jax.distributed): each host passes its LOCAL shard of
    the batch (the train/loader.py `order[process::count]` slice — the
    accelerate dataloader-sharding equivalent) and the global array is
    assembled from per-process data without any cross-host transfer."""
    multiproc = jax.process_count() > 1

    def put(x):
        spec = P(meshlib.DATA_AXIS, *([None] * (x.ndim - 1)))
        sh = NamedSharding(mesh, spec)
        if multiproc:
            import numpy as np

            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    return jax.device_put(tree, jax.tree.map(lambda _: NamedSharding(mesh, P()), tree))
