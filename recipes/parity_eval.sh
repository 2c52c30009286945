#!/usr/bin/env bash
# Recipe: real-weights parity evaluation + diff against the reference's
# committed eval artifacts.
#
# Given HF-layout checkpoints (materialize with huggingface-cli on a
# connected host) and prepared eval sets (cli.prepare_eval_set), this
# emits the BASELINE.md CER/WER rows in the reference's exact schema —
# metric.{lang}.{task}.jsonl records + per-utterance prediction CSVs
# (id,reference_norm,prediction_norm,reference_raw,prediction_raw;
# run_short_form_eval.py:120-149,227-242) — then diffs them against the
# reference stack's committed results (REF_EVAL, default the reference
# checkout's eval_pipeline/). Metric rows matching within --tolerance
# percentage points reproduce the README tables; prediction-level drift is
# listed per utterance id.
#
# Offline regression variant (no real weights needed): the committed
# tiny-model goldens under tests/goldens/eval_pipeline are checked by
# `pytest tests/test_eval_goldens.py` on every run of the suite.
set -euo pipefail

EVAL_DATA=${EVAL_DATA:-/data}
MODELS=${MODELS:-/models/kotoba-whisper-v2.0}
TOKENIZER=${TOKENIZER:-${MODELS%% *}}
OUT=${OUT:-eval_pipeline}
REF_EVAL=${REF_EVAL:-/root/reference/eval_pipeline}
TOLERANCE=${TOLERANCE:-0.5}

for ds in ja_asr.jsut_basic5000 ja_asr.reazonspeech_test ja_asr.common_voice_8_0; do
  [ -d "$EVAL_DATA/$ds" ] || { echo "skip $ds (prepare with cli.prepare_eval_set)"; continue; }
  for m in $MODELS; do
    python -m kotoba_whisper_tpu.cli.eval_short_form \
      --model "$m" --tokenizer "$TOKENIZER" \
      --dataset_dir "$EVAL_DATA/$ds" --dataset_name "$ds" \
      --language ja --task transcribe --output_dir "$OUT"
  done
done

# Cross-stack parity gate: when a sample audio file is provided, compare
# mel/encoder/logits/greedy-tokens of every HF-layout checkpoint against
# the torch+transformers stack (cli/parity_check; SURVEY §7.2's
# token-for-token gate). Random-weight rehearsals may tie-break argmax
# differently at fp tolerance — set PARITY_STRICT=0 to record instead of
# gate.
if [ -n "${PARITY_AUDIO:-}" ]; then
  for m in $MODELS; do
    [ -f "$m/config.json" ] || continue
    if ! python -m kotoba_whisper_tpu.cli.parity_check \
        --checkpoint "$m" --audio "$PARITY_AUDIO" \
        --tokenizer "$TOKENIZER" \
        --language ja --max_length "${PARITY_MAX_LENGTH:-32}"; then
      [ "${PARITY_STRICT:-1}" = "1" ] && exit 1
      echo "parity_check: token mismatch recorded (PARITY_STRICT=0)"
    fi
  done
fi

python -m kotoba_whisper_tpu.eval.report --metric_jsonl "$OUT/metric.ja.transcribe.jsonl" || true
python -m kotoba_whisper_tpu.cli.eval_diff \
  --ours "$OUT" --reference "$REF_EVAL" --tolerance "$TOLERANCE"
