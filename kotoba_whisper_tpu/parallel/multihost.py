"""Multi-host runtime: process-group init, barriers, and host-sharded data.

TPU-native counterpart of the reference's Accelerator/NCCL process-group
layer (run_pseudo_labelling.py:192-199; SURVEY.md §5.8):
`jax.distributed.initialize` replaces the NCCL rendezvous (init timeout
handling included), `sync_global_devices` replaces `wait_for_everyone`
barriers (:345,352), and `process_allgather` replaces `gather_for_metrics`
(:341). Per-host input sharding replaces accelerate's dataloader sharding:
each host reads only its shard slice of the tar-shard list.
"""
from __future__ import annotations

import os
from typing import Iterable, Iterator, Sequence, TypeVar

import jax
import numpy as np

T = TypeVar("T")


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    init_timeout_s: int = 7200,
) -> None:
    """Join the multi-host process group. No-ops for single-process runs.

    The 7200 s timeout mirrors the reference's raised NCCL timeout
    (InitProcessGroupKwargs(timeout=7200), run_pseudo_labelling.py:192).
    """
    if num_processes is None and "JAX_NUM_PROCESSES" not in os.environ:
        if coordinator_address is None:
            return  # single-process
    try:
        # CPU process groups (tests, dev boxes) need an explicit
        # cross-process collectives transport; TPU backends ignore it.
        if str(jax.config.jax_platforms or "").startswith("cpu"):
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=init_timeout_s,
    )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Global device barrier (wait_for_everyone equivalent)."""
    if jax.process_count() > 1:
        from jax.experimental.multihost_utils import sync_global_devices

        sync_global_devices(name)


def all_gather_host(x: np.ndarray) -> np.ndarray:
    """Gather per-host arrays to every host (gather_for_metrics
    equivalent; per-host rows concatenated in process order)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental.multihost_utils import process_allgather

    return np.asarray(process_allgather(x)).reshape((-1,) + np.asarray(x).shape[1:])


def pad_across_processes(
    x: np.ndarray, axis: int = 1, pad_value: int = 0
) -> np.ndarray:
    """accelerate's pad_across_processes equivalent
    (run_pseudo_labelling.py:339): pad a host-local array to the global
    max extent along `axis` so ragged per-host decode outputs can be
    concatenated by all_gather_host. Static-shape decode usually makes
    this a no-op; it matters when hosts trim their outputs to local
    content length before gathering."""
    x = np.asarray(x)
    sizes = all_gather_host(np.asarray([x.shape[axis]], np.int64))
    m = int(sizes.max())
    if x.shape[axis] == m:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, m - x.shape[axis])
    return np.pad(x, pad, constant_values=pad_value)


def host_copy(tree):
    """Host-numpy copy of a (possibly multi-process-sharded) pytree.

    Single-process: plain device_get. Multi-process: leaves whose shards
    span processes are reassembled to the full global value on every host
    via a replicating reshard (the collective the HF-export and
    metric-logging paths need before touching numpy — a bare device_get
    raises on non-addressable shards)."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def one(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            mesh = x.sharding.mesh
            from jax.sharding import PartitionSpec

            return np.asarray(
                multihost_utils.global_array_to_host_local_array(
                    x, mesh, PartitionSpec()
                )
            )
        return np.asarray(x)

    return jax.tree.map(one, tree)


def shard_for_host(items: Sequence[T]) -> list[T]:
    """Static round-robin split of a work list across hosts — the input-
    pipeline counterpart of accelerate's sharded dataloader. Tar shards are
    the unit of work (idempotent-chunk design, SURVEY.md §5.3)."""
    return list(items[jax.process_index() :: jax.process_count()])


def interleave_prefetch(it: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Background-thread prefetch of an iterator (the reference overlaps
    chunk N+1 download/preprocess with chunk N compute,
    script/distil_whisper_v2.0.sh:72-84 — same double-buffering, in-process)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()

    def producer():
        try:
            for item in it:
                q.put(item)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item
