"""Determinism-by-construction (SURVEY §5.2): identical seeds produce
bit-identical decode outputs and training trajectories — the property that
replaces the reference's barrier-based race avoidance."""
import numpy as np

import jax
import jax.numpy as jnp

from kotoba_whisper_tpu.core.config import SpecialTokens, WhisperConfig
from kotoba_whisper_tpu.decode.greedy import GenerateOptions, generate_greedy
from kotoba_whisper_tpu.models import whisper
from kotoba_whisper_tpu.models.student_init import init_student_from_teacher
from kotoba_whisper_tpu.train import distill, optim
from tests.test_train import make_batch, tiny_cfg

VOCAB = 51865
ST = SpecialTokens.for_vocab(VOCAB)


def test_greedy_bitwise_deterministic(rng):
    cfg = WhisperConfig(
        vocab_size=VOCAB, num_mel_bins=80, d_model=64, encoder_layers=2,
        encoder_attention_heads=4, decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128, max_source_positions=64,
        max_target_positions=32,
    )
    params = whisper.init_params(jax.random.key(11), cfg)
    mel = jnp.asarray(
        rng.standard_normal((2, 80, 128)), jnp.float32
    )
    opts = GenerateOptions(
        prompt_ids=(ST.sot, ST.lang_begin + 6, ST.transcribe), max_length=16
    )
    a = np.asarray(generate_greedy(params, cfg, mel, opts, ST))
    jax.clear_caches()  # force a fresh compile: determinism across compiles
    b = np.asarray(generate_greedy(params, cfg, mel, opts, ST))
    np.testing.assert_array_equal(a, b)


def test_training_trajectory_deterministic(rng):
    cfg = tiny_cfg()
    teacher = whisper.init_params(jax.random.key(0), cfg)
    batch = make_batch(rng, cfg, b=2, t=8)

    def run():
        student, s_cfg = init_student_from_teacher(
            teacher, cfg, decoder_layers=2
        )
        dc = distill.DistillConfig(compute_dtype=jnp.float32, remat=False)
        tx, _ = optim.make_optimizer(student, lr=1e-3, warmup_steps=1)
        state = distill.init_train_state(student, tx)
        step = distill.jit_train_step(
            distill.make_train_step(s_cfg, cfg, dc, tx), donate_state=False
        )
        losses = []
        for _ in range(3):
            state, m = step(state, teacher, batch)
            losses.append(float(m["loss"]))
        return losses, jax.device_get(state.params)

    l1, p1 = run()
    l2, p2 = run()
    assert l1 == l2
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
