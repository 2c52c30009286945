"""Distillation train-step throughput sweep (real-chip timing).

Times the fused train step (student fwd+bwd + frozen-shared-encoder teacher
fwd + AdamW) at several batch sizes / remat settings to find the
throughput-optimal training config. Ledger point: B=8, remat=True measured
370 ms/step = 648 audio-s/s/chip (docs/DESIGN.md).

Usage: python tools/train_exp.py --batch 16 [--no_remat] [--trials 5]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kotoba_whisper_tpu.core.config import PRESETS
from kotoba_whisper_tpu.models import whisper
from kotoba_whisper_tpu.models.student_init import init_student_from_teacher
from kotoba_whisper_tpu.train import distill


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--label_len", type=int, default=128)
    ap.add_argument("--no_remat", action="store_true")
    ap.add_argument("--microbatches", type=int, default=1)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--preset", default="large-v3")
    ap.add_argument("--decoder_layers", type=int, default=2)
    args = ap.parse_args()

    tcfg = PRESETS[args.preset]
    teacher = whisper.init_params(jax.random.key(0), tcfg)
    teacher = jax.tree.map(lambda x: x.astype(jnp.bfloat16), teacher)
    student, scfg = init_student_from_teacher(
        teacher, tcfg, decoder_layers=args.decoder_layers
    )
    student = jax.tree.map(lambda x: x.astype(jnp.bfloat16), student)

    dc = distill.DistillConfig(
        remat=not args.no_remat, num_microbatches=args.microbatches
    )
    tx = optax.adamw(1e-4)
    state = distill.init_train_state(student, tx)
    step_fn = distill.jit_train_step(
        distill.make_train_step(scfg, tcfg, dc, tx)
    )

    rng = np.random.default_rng(0)
    b, t = args.batch, args.label_len
    labels = rng.integers(0, tcfg.vocab_size, (b, t)).astype(np.int32)
    labels[:, t // 2:] = -100
    batch = {
        "input_features": jnp.asarray(
            rng.standard_normal((b, tcfg.num_mel_bins, 3000)).astype(np.float32)
            * 0.1,
            jnp.bfloat16,
        ),
        "labels": jnp.asarray(labels),
        "decoder_input_ids": jnp.asarray(
            np.roll(np.where(labels == -100, 50256, labels), 1, axis=1)
        ),
    }

    t0 = time.perf_counter()
    state, metrics = step_fn(state, teacher, batch)
    jax.block_until_ready(metrics)
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(args.trials):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, teacher, batch)
        # force full execution: readback, not just block_until_ready
        float(jax.tree.leaves(metrics)[0])
        times.append(time.perf_counter() - t0)
    dt = float(np.min(times))
    print(
        json.dumps(
            {
                "batch": b,
                "remat": not args.no_remat,
                "microbatches": args.microbatches,
                "ms_step": round(dt * 1e3, 1),
                "audio_s_per_s": round(b * 30.0 / dt, 1),
                "compile_s": round(compile_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
