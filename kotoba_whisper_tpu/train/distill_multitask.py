"""Bilingual / multi-task distillation (v3 trainer).

Re-implements run_distillation_v3.py semantics TPU-first:
  - N datasets zipped per step, each contributing a sub-batch
    (:338-366 — ja + en at half batch each);
  - per dataset, the student encoder runs ONCE and its hidden states are
    reused for every (task, language) decode of that audio (:309-321);
  - CE summed across tasks; KL only where the dataset enables it
    (:324-330); loss = ce_weight·ΣCE + kl_weight·ΣKL (:331-335);
  - per-task metrics named `ce_loss.{task}.{lang}` (:322-334).

Batch structure (static pytree keys per jit):
  [ {"input_features": (B_i, M, T),
     "tasks": {"transcribe.ja": {"labels", "decoder_input_ids"}, ...},
     "use_kl": bool (static, in config)} , ... ]
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import optax

from kotoba_whisper_tpu.core.config import WhisperConfig
from kotoba_whisper_tpu.models import whisper
from kotoba_whisper_tpu.train.distill import (
    DistillConfig,
    TrainState,
    kl_divergence,
)


@dataclass(frozen=True)
class DatasetSpec:
    """One zipped dataset: its task keys ("{task}.{lang}") and KL flag
    (dataset_kl_*, run_distillation_v3.py:324-330)."""

    name: str
    task_keys: tuple[str, ...]
    use_kl: bool = True


def multitask_loss(
    student_params: Any,
    teacher_params: Any,
    student_cfg: WhisperConfig,
    teacher_cfg: WhisperConfig,
    dc: DistillConfig,
    specs: tuple[DatasetSpec, ...],
    batches: tuple[dict[str, Any], ...],
):
    sp = student_params
    if dc.freeze_encoder:
        sp = dict(sp)
        sp["encoder"] = jax.lax.stop_gradient(student_params["encoder"])

    total_ce = jnp.zeros(())
    total_kl = jnp.zeros(())
    metrics: dict[str, jax.Array] = {}

    for spec, batch in zip(specs, batches):
        # one encoder pass per dataset's audio, reused across its tasks
        enc_out = whisper.encode(
            sp, student_cfg, batch["input_features"],
            compute_dtype=dc.compute_dtype, attn_impl=dc.attn_impl,
            remat=dc.remat,
        )
        if dc.share_hidden_states and dc.freeze_encoder:
            teacher_enc = jax.lax.stop_gradient(enc_out)
        elif spec.use_kl:
            teacher_enc = whisper.encode(
                teacher_params, teacher_cfg, batch["input_features"],
                compute_dtype=dc.compute_dtype, attn_impl=dc.attn_impl,
            )
        else:
            teacher_enc = None

        for key in spec.task_keys:
            tb = batch["tasks"][key]
            logits = whisper.decode(
                sp, student_cfg, tb["decoder_input_ids"], enc_out,
                compute_dtype=dc.compute_dtype, attn_impl=dc.attn_impl,
                remat=dc.remat,
            )
            ce = whisper.ce_loss(logits, tb["labels"])
            total_ce = total_ce + ce
            metrics[f"ce_loss.{key}"] = ce
            if spec.use_kl:
                t_logits = jax.lax.stop_gradient(
                    whisper.decode(
                        teacher_params, teacher_cfg,
                        tb["decoder_input_ids"], teacher_enc,
                        compute_dtype=dc.compute_dtype, attn_impl=dc.attn_impl,
                    )
                )
                kl = kl_divergence(
                    logits, t_logits, tb["labels"], dc.temperature
                )
                total_kl = total_kl + kl
                metrics[f"kl_loss.{key}"] = kl

    loss = dc.ce_weight * total_ce + dc.kl_weight * total_kl
    metrics["ce_loss"] = total_ce
    metrics["kl_loss"] = total_kl
    return loss, metrics


def make_multitask_train_step(
    student_cfg: WhisperConfig,
    teacher_cfg: WhisperConfig,
    dc: DistillConfig,
    specs: tuple[DatasetSpec, ...],
    tx: optax.GradientTransformation,
    sched: optax.Schedule | None = None,
):
    def step(state: TrainState, teacher_params: Any, batches: tuple):
        (loss, metrics), grads = jax.value_and_grad(
            multitask_loss, has_aux=True
        )(
            state.params, teacher_params, student_cfg, teacher_cfg, dc,
            specs, batches,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        if sched is not None:
            metrics["learning_rate"] = sched(state.step)
        return TrainState(params, opt_state, state.step + 1), metrics

    return step
