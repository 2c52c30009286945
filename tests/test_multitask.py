"""Bilingual multi-task trainer tests: per-task CE aggregation, selective
KL, shared-encoder reuse, and a smoke optimization loop."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kotoba_whisper_tpu.models import whisper
from kotoba_whisper_tpu.models.student_init import init_student_from_teacher
from kotoba_whisper_tpu.train import distill, optim
from kotoba_whisper_tpu.train.distill_multitask import (
    DatasetSpec,
    make_multitask_train_step,
    multitask_loss,
)
from tests.test_train import make_batch, tiny_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    teacher = whisper.init_params(jax.random.key(0), cfg)
    student, s_cfg = init_student_from_teacher(teacher, cfg, decoder_layers=2)
    return cfg, s_cfg, teacher, student


def _task_batch(rng, cfg, b, keys):
    base = make_batch(rng, cfg, b=b)
    return {
        "input_features": base["input_features"],
        "tasks": {
            k: {
                "labels": make_batch(rng, cfg, b=b)["labels"],
                "decoder_input_ids": make_batch(rng, cfg, b=b)["decoder_input_ids"],
            }
            for k in keys
        },
    }


def test_multitask_loss_structure(setup, rng):
    cfg, s_cfg, teacher, student = setup
    dc = distill.DistillConfig(compute_dtype=jnp.float32, remat=False)
    specs = (
        DatasetSpec("ja", ("transcribe.ja", "translate.en"), use_kl=True),
        DatasetSpec("en", ("transcribe.en",), use_kl=False),
    )
    batches = (
        _task_batch(rng, cfg, 2, ["transcribe.ja", "translate.en"]),
        _task_batch(rng, cfg, 2, ["transcribe.en"]),
    )
    loss, metrics = multitask_loss(
        student, teacher, s_cfg, cfg, dc, specs, batches
    )
    assert {"ce_loss.transcribe.ja", "ce_loss.translate.en",
            "ce_loss.transcribe.en", "kl_loss.transcribe.ja",
            "kl_loss.translate.en"} <= set(metrics)
    # en dataset has KL disabled
    assert "kl_loss.transcribe.en" not in metrics
    # aggregates
    ce_sum = (
        metrics["ce_loss.transcribe.ja"]
        + metrics["ce_loss.translate.en"]
        + metrics["ce_loss.transcribe.en"]
    )
    np.testing.assert_allclose(float(metrics["ce_loss"]), float(ce_sum), rtol=1e-6)
    expected = 0.8 * float(ce_sum) + 1.0 * float(metrics["kl_loss"])
    np.testing.assert_allclose(float(loss), expected, rtol=1e-6)


def test_multitask_train_smoke(setup, rng):
    cfg, s_cfg, teacher, student = setup
    dc = distill.DistillConfig(compute_dtype=jnp.float32, remat=False)
    specs = (DatasetSpec("ja", ("transcribe.ja",), use_kl=True),)
    tx, sched = optim.make_optimizer(student, lr=3e-3, warmup_steps=1)
    state = distill.init_train_state(student, tx)
    step = jax.jit(make_multitask_train_step(s_cfg, cfg, dc, specs, tx, sched))
    batches = (_task_batch(rng, cfg, 4, ["transcribe.ja"]),)
    losses = []
    for _ in range(10):
        state, m = step(state, teacher, batches)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.95, losses
