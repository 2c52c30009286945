"""Stage-4 driver: initialize a student from a teacher checkpoint.

Counterpart of create_student_model.py: maximally-spaced layer selection
(models/student_init.py), save in HF layout, then reload and run a dummy
forward pass as a sanity check (create_student_model.py:139-153).
"""
from __future__ import annotations

import argparse


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--teacher", required=True,
                    help="'preset:<name>' or checkpoint dir")
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--encoder_layers", type=int, default=None)
    ap.add_argument("--decoder_layers", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    arg = ap.parse_args(argv)

    from kotoba_whisper_tpu.utils.backend import ensure_backend

    ensure_backend()

    import jax.numpy as jnp
    import numpy as np

    from kotoba_whisper_tpu.cli import common
    from kotoba_whisper_tpu.models import whisper
    from kotoba_whisper_tpu.models.student_init import init_student_from_teacher
    from kotoba_whisper_tpu.train.checkpoint import export_hf_model, import_hf_model

    teacher, t_cfg = common.load_model(arg.teacher, seed=arg.seed)
    student, s_cfg = init_student_from_teacher(
        teacher, t_cfg,
        encoder_layers=arg.encoder_layers,
        decoder_layers=arg.decoder_layers,
    )
    export_hf_model(arg.save_dir, student, s_cfg)

    # reload + dummy forward sanity check (1 s of ones)
    params, cfg = import_hf_model(arg.save_dir)
    mel = jnp.ones((1, cfg.num_mel_bins, 2 * cfg.max_source_positions), jnp.float32)
    ids = jnp.full((1, 4), cfg.decoder_start_token_id, jnp.int32)
    logits, _ = whisper.forward(params, cfg, mel, ids)
    assert np.isfinite(np.asarray(logits)).all(), "dummy forward produced non-finite logits"

    print(
        f"student saved to {arg.save_dir}: "
        f"{t_cfg.encoder_layers}+{t_cfg.decoder_layers} -> "
        f"{cfg.encoder_layers}+{cfg.decoder_layers} layers, "
        f"{whisper.param_count(params):,} params "
        f"(teacher {whisper.param_count(teacher):,})"
    )


if __name__ == "__main__":
    main()
