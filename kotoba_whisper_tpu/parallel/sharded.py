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


def _spans_processes(mesh: Mesh) -> bool:
    import jax as _jax

    return _jax.process_count() > 1 and (
        len({d.process_index for d in mesh.devices.flat}) > 1
    )


def place_params(mesh: Mesh, params: Any, model_sharded: bool = False) -> Any:
    """Device-put params: replicated (pure DP) or model-axis sharded (TP).

    Multi-process (jax.distributed): every process holds the same host
    value (same-seed init or same checkpoint), and each materializes only
    its addressable shards via make_array_from_callback — `device_put` to
    a sharding that spans processes would need backend cross-host
    transfers (unsupported on CPU/gloo and on single-host TPU plugins)
    and trips buffer-reuse hazards when a leaf appears twice in the tree
    (tied embeddings)."""
    if model_sharded:
        shardings = meshlib.shardings_for_params(mesh, params)
    else:
        shardings = jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    if _spans_processes(mesh):
        import numpy as np

        def put(x, sh):
            host = np.asarray(x)
            return jax.make_array_from_callback(
                host.shape, sh, lambda idx: host[idx]
            )

        return jax.tree.map(put, params, shardings)
    return jax.device_put(params, shardings)


def place_batch(mesh: Mesh, batch: Any) -> Any:
    """Shard batch leaves over the data axis (leading dim).

    Single-process: a device_put of the host-built global batch.
    Multi-process (jax.distributed): each host passes its LOCAL shard of
    the batch (the train/loader.py `order[process::count]` slice — the
    accelerate dataloader-sharding equivalent) and the global array is
    assembled from per-process data without any cross-host transfer.
    A mesh over local devices only (DP-per-host decode) keeps the plain
    device_put path even under a process group."""
    multiproc = _spans_processes(mesh)

    def put(x):
        spec = P(meshlib.DATA_AXIS, *([None] * (x.ndim - 1)))
        sh = NamedSharding(mesh, spec)
        if multiproc:
            import numpy as np

            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    if _spans_processes(mesh):
        import numpy as np

        sh = NamedSharding(mesh, P())

        def put(x):
            host = np.asarray(x)
            return jax.make_array_from_callback(
                host.shape, sh, lambda idx: host[idx]
            )

        return jax.tree.map(put, tree)
    return jax.device_put(
        tree, jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
    )
