"""Distillation training step: CE + temperature-scaled KL vs teacher logits.

Re-implements the core loop of run_distillation.py (train_step :625-661,
kl_divergence :614-622) TPU-first:

  - loss = 0.8*CE + kl_weight * KL(T)·T², KL elementwise
    softmax(teacher/T) · (log softmax(teacher/T) − log softmax(student/T)),
    −100-masked, summed and divided by the number of valid positions
    ("batchmean over tokens" — exact reference reduction),
  - frozen encoder via `stop_gradient` on the encoder subtree
    (freeze_encoder, run_distillation.py:493-498),
  - `share_hidden_states` (:641-649): when the encoder is frozen and teacher
    and student share d_model, the teacher consumes the *student's* encoder
    output, skipping the 32-layer teacher encoder entirely,
  - gradient accumulation as a `lax.scan` over microbatches (reference:
    accelerator.accumulate :730),
  - one fused jit: fwd + bwd + AdamW update + metrics; under a mesh the
    batch axis is sharded over "data" and gradient psum falls out of pjit —
    no hand-written collectives (SURVEY.md §2.3).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from kotoba_whisper_tpu.core.config import WhisperConfig
from kotoba_whisper_tpu.models import whisper


@dataclass(frozen=True)
class DistillConfig:
    """DistillationTrainingArguments equivalents (run_distillation.py:172-194)."""

    ce_weight: float = 0.8
    kl_weight: float = 1.0
    temperature: float = 2.0
    freeze_encoder: bool = True
    share_hidden_states: bool = True  # requires frozen encoder + equal d_model
    num_microbatches: int = 1
    compute_dtype: Any = jnp.bfloat16
    attn_impl: str = "xla"
    remat: bool = True


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def init_train_state(params: Any, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def kl_divergence(
    student_logits: jax.Array,
    teacher_logits: jax.Array,
    labels: jax.Array,
    temperature: float,
) -> jax.Array:
    """Masked token-mean KL × T² (run_distillation.py:614-622,653-657)."""
    t = temperature
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, axis=-1)
    tp = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    per_elem = jnp.exp(tp) * (tp - s)  # KL(target||pred) elementwise
    mask = (labels >= 0).astype(jnp.float32)
    per_tok = jnp.sum(per_elem, axis=-1) * mask
    return jnp.sum(per_tok) / jnp.maximum(jnp.sum(mask), 1.0) * (t * t)


def distill_loss(
    student_params: Any,
    teacher_params: Any,
    student_cfg: WhisperConfig,
    teacher_cfg: WhisperConfig,
    dc: DistillConfig,
    batch: dict[str, jax.Array],
):
    """Returns (loss, metrics). batch: input_features (B, mels, 3000),
    labels (B, T) with -100 padding, decoder_input_ids (B, T)."""
    sp = student_params
    if dc.freeze_encoder:
        sp = dict(sp)
        sp["encoder"] = jax.lax.stop_gradient(student_params["encoder"])

    enc_out = whisper.encode(
        sp, student_cfg, batch["input_features"],
        compute_dtype=dc.compute_dtype, attn_impl=dc.attn_impl, remat=dc.remat,
    )
    student_logits = whisper.decode(
        sp, student_cfg, batch["decoder_input_ids"], enc_out,
        compute_dtype=dc.compute_dtype, attn_impl=dc.attn_impl, remat=dc.remat,
    )
    ce = whisper.ce_loss(student_logits, batch["labels"])

    # teacher forward, no grad
    if dc.share_hidden_states and dc.freeze_encoder:
        teacher_enc = jax.lax.stop_gradient(enc_out)
    else:
        teacher_enc = whisper.encode(
            teacher_params, teacher_cfg, batch["input_features"],
            compute_dtype=dc.compute_dtype, attn_impl=dc.attn_impl,
        )
    teacher_logits = jax.lax.stop_gradient(
        whisper.decode(
            teacher_params, teacher_cfg, batch["decoder_input_ids"], teacher_enc,
            compute_dtype=dc.compute_dtype, attn_impl=dc.attn_impl,
        )
    )
    kl = kl_divergence(
        student_logits, teacher_logits, batch["labels"], dc.temperature
    )
    loss = dc.ce_weight * ce + dc.kl_weight * kl
    return loss, {"ce_loss": ce, "kl_loss": kl}


def make_train_step(
    student_cfg: WhisperConfig,
    teacher_cfg: WhisperConfig,
    dc: DistillConfig,
    tx: optax.GradientTransformation,
    sched: optax.Schedule | None = None,
):
    """Build the fused jitted train step.

    step(state, teacher_params, batch) -> (state, metrics)
    With num_microbatches > 1, batch leading dim must be divisible; grads
    are mean-accumulated across microbatches via lax.scan before one
    optimizer update (accelerator.accumulate semantics).
    """

    def grads_of(params, teacher_params, batch):
        return jax.value_and_grad(distill_loss, has_aux=True)(
            params, teacher_params, student_cfg, teacher_cfg, dc, batch
        )

    def step(state: TrainState, teacher_params: Any, batch: dict[str, jax.Array]):
        if dc.num_microbatches > 1:
            mb = dc.num_microbatches

            def split(x):
                return x.reshape(mb, x.shape[0] // mb, *x.shape[1:])

            micro = jax.tree.map(split, batch)

            def body(carry, mb_batch):
                (loss, metrics), grads = grads_of(
                    state.params, teacher_params, mb_batch
                )
                acc_grads, acc_loss, acc_m = carry
                acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
                return (
                    acc_grads,
                    acc_loss + loss,
                    jax.tree.map(jnp.add, acc_m, metrics),
                ), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            init = (zero_grads, jnp.zeros(()), {"ce_loss": jnp.zeros(()), "kl_loss": jnp.zeros(())})
            (grads, loss, metrics), _ = jax.lax.scan(body, init, micro)
            grads = jax.tree.map(lambda g: g / mb, grads)
            loss = loss / mb
            metrics = jax.tree.map(lambda m: m / mb, metrics)
        else:
            (loss, metrics), grads = grads_of(state.params, teacher_params, batch)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        if sched is not None:
            metrics["learning_rate"] = sched(state.step)
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


def jit_train_step(step_fn, donate_state: bool = True):
    return jax.jit(step_fn, donate_argnums=(0,) if donate_state else ())
