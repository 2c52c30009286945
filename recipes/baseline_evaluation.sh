#!/usr/bin/env bash
# Recipe: full baseline evaluation sweep (CER/WER accuracy tables).
#
# Mirrors script/baseline_evaluation.sh: every checkpoint in $MODELS is run
# over (1) the three ja ASR test sets, (2) the English ESB eval configs, and
# (3) the speech-translation sets, producing the prediction CSVs +
# metric.{lang}.{task}.jsonl records behind the README tables. Checkpoints
# are HF-layout dirs (materialize with huggingface-cli on a connected host;
# eval sets with cli.prepare_eval_set). Add-on variants (--punctuator /
# --stable_ts, the v1.1/v2.1 rows) run for models listed in ADDON_MODELS.
set -euo pipefail

EVAL_DATA=${EVAL_DATA:-/data}
TOKENIZER=${TOKENIZER:-/models/whisper-large-v3}
# space-separated checkpoint dirs, e.g. "/models/whisper-large-v3 /models/kotoba-whisper-v2.0 work/v2.0/distilled/final"
MODELS=${MODELS:-/models/whisper-large-v3}
ADDON_MODELS=${ADDON_MODELS:-}
BATCH=${BATCH:-32}

# ---- Japanese ASR ----
for ds in ja_asr.jsut_basic5000 ja_asr.reazonspeech_test ja_asr.common_voice_8_0; do
  [ -d "$EVAL_DATA/$ds" ] || { echo "skip $ds"; continue; }
  for m in $MODELS; do
    python -m kotoba_whisper_tpu.cli.eval_short_form \
      --model "$m" --tokenizer "$TOKENIZER" \
      --dataset_dir "$EVAL_DATA/$ds" --dataset_name "$ds" \
      --language ja --task transcribe
  done
  for m in $ADDON_MODELS; do
    for flags in "--punctuator" "--stable_ts" "--punctuator --stable_ts"; do
      # shellcheck disable=SC2086
      python -m kotoba_whisper_tpu.cli.eval_short_form \
        --model "$m" --tokenizer "$TOKENIZER" \
        --dataset_dir "$EVAL_DATA/$ds" --dataset_name "$ds" \
        --language ja --task transcribe $flags
    done
  done
done

# ---- English ASR (ESB eval configs) ----
for cfgname in ami earnings22 tedlium voxpopuli librispeech spgispeech gigaspeech common_voice; do
  ds="en_asr.esb_eval.$cfgname"
  [ -d "$EVAL_DATA/$ds" ] || { echo "skip $ds"; continue; }
  for m in $MODELS; do
    python -m kotoba_whisper_tpu.cli.eval_short_form \
      --model "$m" --tokenizer "$TOKENIZER" \
      --dataset_dir "$EVAL_DATA/$ds" --dataset_name "$ds" \
      --language en --task transcribe
  done
done

# ---- Speech translation (ja<->en) ----
for pair in "ja2en.fleurs ja translate" "en2ja.fleurs en translate"; do
  set -- $pair; ds="st.$1"; lang=$2; task=$3
  [ -d "$EVAL_DATA/$ds" ] || { echo "skip $ds"; continue; }
  for m in $MODELS; do
    python -m kotoba_whisper_tpu.cli.eval_short_form \
      --model "$m" --tokenizer "$TOKENIZER" \
      --dataset_dir "$EVAL_DATA/$ds" --dataset_name "$ds" \
      --language "$lang" --task "$task"
  done
done

# ---- pivot tables (README-style markdown) ----
for j in eval_pipeline/metric.*.jsonl; do
  [ -f "$j" ] || continue
  echo "## $j"
  python -m kotoba_whisper_tpu.eval.report --metric_jsonl "$j"
done
