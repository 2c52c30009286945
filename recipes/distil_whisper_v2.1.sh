#!/usr/bin/env bash
# Recipe: kotoba-whisper v2.1 — v2.0 + post-processing add-ons.
#
# Mirrors script/distil_whisper_v2.1.sh (identical in structure to v1.1's:
# compose punctuator + stable-timestamp add-ons over the v2.0 student and
# evaluate all four combinations on the ja suite).
set -euo pipefail

MODEL=${MODEL:-work/v2.0/distilled/final}
TOKENIZER=${TOKENIZER:-/models/whisper-large-v3}
EVAL_DATA=${EVAL_DATA:-/data}
BATCH=${BATCH:-256}

for ds in ja_asr.jsut_basic5000 ja_asr.reazonspeech_test ja_asr.common_voice_8_0; do
  [ -d "$EVAL_DATA/$ds" ] || { echo "skip $ds (not materialized)"; continue; }
  for flags in "" "--punctuator" "--stable_ts" "--punctuator --stable_ts"; do
    # shellcheck disable=SC2086
    python -m kotoba_whisper_tpu.cli.eval_short_form \
      --model "$MODEL" --tokenizer "$TOKENIZER" \
      --dataset_dir "$EVAL_DATA/$ds" --dataset_name "$ds" \
      --language ja --task transcribe $flags
  done
done
