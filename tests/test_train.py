"""Distillation training tests.

Loss parity against a torch re-statement of the reference's loss spec
(run_distillation.py:614-661), frozen-encoder gradient behavior, and a
smoke train loop asserting optimization progress.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kotoba_whisper_tpu.core.config import WhisperConfig
from kotoba_whisper_tpu.models import whisper
from kotoba_whisper_tpu.models.student_init import (
    init_student_from_teacher,
    spaced_layer_map,
)
from kotoba_whisper_tpu.train import distill, optim


def tiny_cfg(dec_layers=4):
    return WhisperConfig(
        vocab_size=256,
        num_mel_bins=16,
        d_model=32,
        encoder_layers=4,
        encoder_attention_heads=4,
        decoder_layers=dec_layers,
        decoder_attention_heads=4,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        max_source_positions=32,
        max_target_positions=24,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=1,
        decoder_start_token_id=2,
    )


def make_batch(rng, cfg, b=2, t=10):
    labels = rng.integers(3, cfg.vocab_size, (b, t)).astype(np.int32)
    labels[:, -2:] = -100
    return {
        "input_features": jnp.asarray(
            rng.standard_normal((b, cfg.num_mel_bins, 2 * cfg.max_source_positions)),
            jnp.float32,
        ),
        "labels": jnp.asarray(labels),
        "decoder_input_ids": whisper.shift_labels_right(
            jnp.asarray(labels), cfg.decoder_start_token_id, cfg.pad_token_id
        ),
    }


def test_spaced_layer_map():
    assert spaced_layer_map(32, 2).tolist() == [0, 31]
    assert spaced_layer_map(32, 4).tolist() == [0, 10, 20, 31]
    assert spaced_layer_map(12, 12).tolist() == list(range(12))


def test_student_init_copies_layers():
    cfg = tiny_cfg()
    params = whisper.init_params(jax.random.key(0), cfg)
    student, s_cfg = init_student_from_teacher(params, cfg, decoder_layers=2)
    assert s_cfg.decoder_layers == 2
    t_k = np.asarray(params["decoder"]["layers"]["fc1"]["kernel"])
    s_k = np.asarray(student["decoder"]["layers"]["fc1"]["kernel"])
    np.testing.assert_array_equal(s_k[0], t_k[0])
    np.testing.assert_array_equal(s_k[1], t_k[3])
    # encoder untouched
    np.testing.assert_array_equal(
        np.asarray(student["encoder"]["layers"]["fc1"]["kernel"]),
        np.asarray(params["encoder"]["layers"]["fc1"]["kernel"]),
    )


def test_kl_matches_torch_spec(rng):
    torch = pytest.importorskip("torch")
    b, t, v = 2, 6, 32
    s = rng.standard_normal((b, t, v)).astype(np.float32)
    tch = rng.standard_normal((b, t, v)).astype(np.float32)
    labels = rng.integers(0, v, (b, t)).astype(np.int64)
    labels[0, -2:] = -100
    temperature = 2.0

    # reference spec (run_distillation.py:614-622): KLDivLoss(reduction=none),
    # mask by labels>=0, sum / n_valid, x T^2
    st_t = torch.from_numpy(s)
    te_t = torch.from_numpy(tch)
    target = torch.softmax(te_t / temperature, dim=-1)
    logp = torch.log_softmax(st_t / temperature, dim=-1)
    div = torch.nn.KLDivLoss(reduction="none")(logp, target)
    mask = (torch.from_numpy(labels) >= 0).unsqueeze(-1)
    golden = (div * mask).sum() / mask.sum() * temperature**2

    ours = distill.kl_divergence(
        jnp.asarray(s), jnp.asarray(tch), jnp.asarray(labels), temperature
    )
    np.testing.assert_allclose(float(ours), float(golden), rtol=1e-5)


def test_frozen_encoder_has_zero_grads(rng):
    cfg = tiny_cfg()
    teacher = whisper.init_params(jax.random.key(0), cfg)
    student, s_cfg = init_student_from_teacher(teacher, cfg, decoder_layers=2)
    dc = distill.DistillConfig(
        freeze_encoder=True, share_hidden_states=True,
        compute_dtype=jnp.float32, remat=False,
    )
    batch = make_batch(rng, cfg)
    grads = jax.grad(
        lambda p: distill.distill_loss(p, teacher, s_cfg, cfg, dc, batch)[0]
    )(student)
    enc_norm = float(
        sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads["encoder"]))
    )
    dec_norm = float(
        sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads["decoder"]))
    )
    assert enc_norm == 0.0
    assert dec_norm > 0.0


def test_train_smoke_loss_decreases(rng):
    cfg = tiny_cfg()
    teacher = whisper.init_params(jax.random.key(0), cfg)
    student, s_cfg = init_student_from_teacher(teacher, cfg, decoder_layers=2)
    dc = distill.DistillConfig(
        freeze_encoder=True, share_hidden_states=True,
        compute_dtype=jnp.float32, remat=False,
    )
    tx, sched = optim.make_optimizer(student, lr=3e-3, warmup_steps=2)
    state = distill.init_train_state(student, tx)
    step = distill.jit_train_step(
        distill.make_train_step(s_cfg, cfg, dc, tx, sched)
    )
    batch = make_batch(rng, cfg, b=4, t=8)
    losses = []
    for _ in range(12):
        state, metrics = step(state, teacher, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses
    assert int(state.step) == 12


def test_microbatch_accumulation_matches_full(rng):
    cfg = tiny_cfg()
    teacher = whisper.init_params(jax.random.key(1), cfg)
    student, s_cfg = init_student_from_teacher(teacher, cfg, decoder_layers=2)
    batch = make_batch(rng, cfg, b=4, t=8)
    tx, _ = optim.make_optimizer(student, lr=1e-3, warmup_steps=0)

    dc1 = distill.DistillConfig(
        compute_dtype=jnp.float32, remat=False, num_microbatches=1
    )
    dc2 = distill.DistillConfig(
        compute_dtype=jnp.float32, remat=False, num_microbatches=2
    )
    s1 = distill.init_train_state(student, tx)
    s2 = distill.init_train_state(student, tx)
    s1, m1 = distill.make_train_step(s_cfg, cfg, dc1, tx)(s1, teacher, batch)
    s2, m2 = distill.make_train_step(s_cfg, cfg, dc2, tx)(s2, teacher, batch)
    # microbatched grads are the mean over two half-batches; each half's
    # loss is token-mean, and with equal valid-token counts per half the
    # results agree closely
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=2e-2
    )
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params
    )
    assert max(jax.tree.leaves(d)) < 5e-3


def test_train_step_bf16_compute(rng):
    """bf16 compute path (production dtype): one step, finite metrics."""
    cfg = tiny_cfg()
    teacher = whisper.init_params(jax.random.key(0), cfg)
    student, s_cfg = init_student_from_teacher(teacher, cfg, decoder_layers=2)
    dc = distill.DistillConfig(
        compute_dtype=jnp.bfloat16, remat=True, num_microbatches=1
    )
    tx, _ = optim.make_optimizer(student, lr=1e-4, warmup_steps=1)
    state = distill.init_train_state(student, tx)
    step = distill.jit_train_step(distill.make_train_step(s_cfg, cfg, dc, tx))
    batch = make_batch(rng, cfg, b=2, t=8)
    state, m = step(state, teacher, batch)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["kl_loss"]))
