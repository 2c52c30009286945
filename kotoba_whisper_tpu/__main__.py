"""Unified CLI: `python -m kotoba_whisper_tpu <stage> [args...]`.

Stages mirror the reference's five pipeline scripts plus evaluation and
reporting (SURVEY.md §0).
"""
from __future__ import annotations

import sys

STAGES = {
    "pseudo-label": ("kotoba_whisper_tpu.cli.pseudo_label", "teacher pseudo-labelling"),
    "filter": ("kotoba_whisper_tpu.cli.data_filter", "WER filtering + vectorize"),
    "merge": ("kotoba_whisper_tpu.cli.merge_splits",
              "merge chunk outputs into split_N training groups"),
    "create-student": ("kotoba_whisper_tpu.cli.create_student", "student init"),
    "distill": ("kotoba_whisper_tpu.cli.distill", "distillation training"),
    "distill-bilingual": (
        "kotoba_whisper_tpu.cli.distill_bilingual", "bilingual distillation"
    ),
    "eval": ("kotoba_whisper_tpu.cli.eval_short_form", "short-form CER/WER eval"),
    "speed": ("kotoba_whisper_tpu.cli.eval_speed", "latency benchmark"),
    "report": ("kotoba_whisper_tpu.eval.report", "markdown metric pivot"),
    "prepare-eval-set": (
        "kotoba_whisper_tpu.cli.prepare_eval_set",
        "materialize an eval dataset into the tar+tsv layout",
    ),
    "parity-check": (
        "kotoba_whisper_tpu.cli.parity_check",
        "token/logit parity vs the reference stack on real weights",
    ),
}


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m kotoba_whisper_tpu <stage> [args...]\n\nstages:")
        for name, (_, desc) in STAGES.items():
            print(f"  {name:18s} {desc}")
        raise SystemExit(0 if len(sys.argv) >= 2 else 2)
    stage = sys.argv[1]
    if stage not in STAGES:
        raise SystemExit(f"unknown stage {stage!r}; try --help")
    import importlib

    mod = importlib.import_module(STAGES[stage][0])
    mod.main(sys.argv[2:])


if __name__ == "__main__":
    main()
