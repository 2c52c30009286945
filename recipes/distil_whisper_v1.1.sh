#!/usr/bin/env bash
# Recipe: kotoba-whisper v1.1 — v1.0 + post-processing add-ons.
#
# Mirrors script/distil_whisper_v1.1.sh: v1.1 is v1.0 with the punctuator
# and stable-timestamp modules composed into the inference pipeline, then
# evaluated on the three ja test sets in all four add-on combinations
# (none / punctuator / stable-ts / both). In this framework the add-ons are
# built into the eval CLI (--punctuator / --stable_ts), so there is no
# separate "push custom pipeline" step — the pipeline+add-ons ARE the
# framework's AsrPipeline + eval/punctuator.py + eval/timestamp_repair.py.
set -euo pipefail

MODEL=${MODEL:-work/v1.0/distilled/final}   # the v1.0 student checkpoint
TOKENIZER=${TOKENIZER:-/models/whisper-large-v3}
EVAL_DATA=${EVAL_DATA:-/data}   # dirs: ja_asr.{jsut_basic5000,reazonspeech_test,common_voice_8_0}
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
