"""Optimizer & LR schedule matching the reference trainer semantics.

AdamW with weight decay applied only to non-LayerNorm, non-bias parameters
(the `get_parameter_names` exclusion at run_distillation.py:359-377,555-576)
and HF-style schedules: constant_with_warmup (the v2.0 recipe,
script/distil_whisper_v2.0.sh:150-177) and linear.
"""
from __future__ import annotations

from typing import Any

import jax
import optax


def decay_mask(params: Any) -> Any:
    """True where weight decay applies: 2D+ kernels and embeddings; False
    for biases, LayerNorm scale/bias, and positional tables."""

    def is_decay(path, leaf) -> bool:
        names = [p.key if hasattr(p, "key") else str(p) for p in path]
        if leaf.ndim <= 1:
            return False
        if any("layer_norm" in n for n in names):
            return False
        if names and names[-1] == "pos_embedding":
            return False
        return True

    return jax.tree_util.tree_map_with_path(is_decay, params)


def lr_schedule(
    kind: str, lr: float, warmup_steps: int, total_steps: int | None = None
) -> optax.Schedule:
    if kind == "constant_with_warmup":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
                optax.constant_schedule(lr),
            ],
            [warmup_steps],
        )
    if kind == "linear":
        assert total_steps is not None
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
                optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1)),
            ],
            [warmup_steps],
        )
    raise ValueError(kind)


def make_optimizer(
    params: Any,
    lr: float = 1e-4,
    warmup_steps: int = 500,
    schedule: str = "constant_with_warmup",
    total_steps: int | None = None,
    weight_decay: float = 0.0,
    max_grad_norm: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    sched = lr_schedule(schedule, lr, warmup_steps, total_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(
            sched, b1=b1, b2=b2, eps=eps,
            weight_decay=weight_decay,
            mask=decay_mask(params) if weight_decay else None,
        ),
    )
    return tx, sched
