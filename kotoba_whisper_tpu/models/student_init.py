"""Student-from-teacher initialization with maximally-spaced layer selection.

Reproduces create_student_model.py:53-128 semantics: the student copies the
teacher's non-layer weights wholesale and takes `np.linspace(0, L-1, n)`
teacher layers for an n-layer student (e.g. decoder layers {0, 31} for
2-of-32). Because our layer params are stacked on a leading axis
(models/whisper.py), the copy is a single gather per leaf — no per-tensor
state_dict surgery.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np

from kotoba_whisper_tpu.core.config import WhisperConfig


def spaced_layer_map(n_teacher: int, n_student: int) -> np.ndarray:
    """Maximally-spaced teacher layer indices (create_student_model.py:78-90)."""
    return np.linspace(0, n_teacher - 1, num=n_student, dtype=np.int64)


def init_student_from_teacher(
    teacher_params: Any,
    teacher_cfg: WhisperConfig,
    *,
    encoder_layers: int | None = None,
    decoder_layers: int | None = None,
    copy: bool = True,
) -> tuple[Any, WhisperConfig]:
    """Build (student_params, student_cfg) from a teacher pytree.

    copy=True materializes fresh buffers: the student is trained (and its
    state donated into jitted update steps) while the teacher stays live,
    so aliasing teacher leaves would trip XLA's donation checks — and
    silently corrupt the teacher if it didn't."""
    enc_n = encoder_layers or teacher_cfg.encoder_layers
    dec_n = decoder_layers or teacher_cfg.decoder_layers
    student_cfg = teacher_cfg.replace(
        encoder_layers=enc_n, decoder_layers=dec_n
    )

    enc_map = spaced_layer_map(teacher_cfg.encoder_layers, enc_n)
    dec_map = spaced_layer_map(teacher_cfg.decoder_layers, dec_n)

    def take(stacked, idx):
        return jax.tree.map(lambda leaf: leaf[idx], stacked)

    student = {
        "encoder": dict(teacher_params["encoder"]),
        "decoder": dict(teacher_params["decoder"]),
    }
    student["encoder"]["layers"] = take(
        teacher_params["encoder"]["layers"], enc_map
    )
    student["decoder"]["layers"] = take(
        teacher_params["decoder"]["layers"], dec_map
    )
    if copy:
        import jax.numpy as jnp

        student = jax.tree.map(jnp.copy, student)
    return student, student_cfg
