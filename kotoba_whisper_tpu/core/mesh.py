"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's accelerate/NCCL process-group layer
(run_pseudo_labelling.py:192-199, run_distillation.py:386-392,609-612): a
`jax.sharding.Mesh` with ("data", "model") axes. Data parallelism = batch axis
sharded over "data"; tensor parallelism for the large-v3 teacher = attention
heads / ffn dims sharded over "model" (SURVEY.md §2.3). Gradient all-reduce
falls out of pjit; no explicit collectives needed in the train step.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class MeshConfig:
    data: int = -1   # -1: all remaining devices
    model: int = 1
    # Lay the model axis across process boundaries instead of within
    # them. Default (False) gives the production topology — DP across
    # hosts, TP within a host, model-axis collectives riding ICI. True
    # puts each model group one-device-per-process, so TP collectives
    # (psum on row-parallel matmuls, cache gathers) cross the host
    # boundary — the topology for a teacher too big for one host's HBM,
    # and the one where mesh-reshape/addressable-shard bugs live
    # (VERDICT r4 #1).
    model_across_processes: bool = False

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = self.model
        data = self.data if self.data != -1 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} != {n_devices} devices"
            )
        return data, model


def build_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    data, model = cfg.resolve(len(devices))
    if cfg.model_across_processes:
        # jax.devices() orders by process; reshape(model, data).T strides
        # the model axis across that order, so model group j holds device
        # j of every process block (2 procs x 4 devs, model=2 ->
        # groups {0,4},{1,5},{2,6},{3,7}).
        dev_array = np.asarray(devices).reshape(model, data).T
    else:
        dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


# ---------------------------------------------------------------------------
# Rule-based parameter sharding.
#
# Params are nested dicts; rules match on the trailing path components.
# Model-parallel layout (megatron-style, scaling-book recipe):
#   - attention q/k/v projection: shard output (head) dim     -> (None, model)
#   - attention out projection:   shard input (head) dim      -> (model, None)
#   - mlp fc1: shard output dim                               -> (None, model)
#   - mlp fc2: shard input dim                                -> (model, None)
#   - embeddings: shard vocab dim over model
#   - everything else (LayerNorm, biases on reduced dims): replicated
# ---------------------------------------------------------------------------

_COLUMN_PARALLEL = ("q_proj", "k_proj", "v_proj", "qkv_proj", "kv_proj", "fc1")
_ROW_PARALLEL = ("out_proj", "fc2")


def _param_spec(path: tuple[str, ...], ndim: int) -> P:
    name = path[-1]
    parent = path[-2] if len(path) >= 2 else ""
    # transformer-layer weights are STACKED on a leading (num_layers,) axis
    # (models/whisper.py) — every dim below shifts right by one
    stacked = "layers" in path

    def spec(*dims):
        return P(None, *dims) if stacked else P(*dims)

    if name == "kernel_scale":
        # w8a8 per-out-channel scales (models/quantized.py): follow the
        # quantized kernel's out-dim sharding so TP composes with
        # --gemm_dtype int8 (column-parallel shards out; row-parallel
        # scales are per-out over a sharded contraction -> replicated)
        return spec(MODEL_AXIS) if parent in _COLUMN_PARALLEL else P()
    base_ndim = ndim - 1 if stacked else ndim
    if base_ndim <= 1:
        # biases / LN scales replicated (GSPMD reshards the add as needed)
        return P()
    if name in ("kernel", "kernel_q"):
        if parent in _COLUMN_PARALLEL:
            return spec(None, MODEL_AXIS)   # column-parallel: shard out dim
        if parent in _ROW_PARALLEL:
            return spec(MODEL_AXIS, None)   # row-parallel: shard in dim
        if parent in ("conv1", "conv2"):
            # (width, in, out): shard out channels
            return P(None, None, MODEL_AXIS)
    if name == "embedding":
        # token embedding stays replicated: sharding the vocab axis would
        # put collectives (all-to-all/all-gather) on the logits softmax and
        # CE/KL gather paths for a ~265 MB table — bad trade at this scale.
        return P()
    return P()


def params_pspec_tree(params: Any) -> Any:
    """PartitionSpec pytree mirroring a param pytree."""

    def spec(path, leaf):
        names = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        return _param_spec(names, leaf.ndim)

    return jax.tree_util.tree_map_with_path(spec, params)


def shardings_for_params(mesh: Mesh, params: Any) -> Any:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), params_pspec_tree(params)
    )


def batch_pspec() -> P:
    return P(DATA_AXIS)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
