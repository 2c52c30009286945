#!/usr/bin/env bash
# Recipe: kotoba-whisper v1.0 — single-pass pipeline on ReazonSpeech `large`
# (script/distil_whisper_v1.0.sh): one pseudo-label + filter pass (no
# chunking), student init, 8-epoch distillation, ja eval.
set -euo pipefail

DATA_DIR=${DATA_DIR:-/data/reazonspeech_large}
WORK=${WORK:-work/v1.0}
TEACHER=${TEACHER:-/models/whisper-large-v3}
TOKENIZER=${TOKENIZER:-/models/whisper-large-v3}

mkdir -p "$WORK"

python -m kotoba_whisper_tpu.cli.pseudo_label \
  --dataset_dir "$DATA_DIR" --output_dir "$WORK/labels" \
  --model "$TEACHER" --tokenizer "$TOKENIZER" \
  --language ja --task transcribe --batch_size 32

python -m kotoba_whisper_tpu.cli.data_filter \
  --dataset_dir "$DATA_DIR" --labels "$WORK/labels/pseudo_labels.jsonl" \
  --output_dir "$WORK/filtered" --tokenizer "$TOKENIZER" \
  --language ja --wer_threshold 10

python -m kotoba_whisper_tpu.cli.create_student \
  --teacher "$TEACHER" --save_dir "$WORK/student_init" --decoder_layers 2

python -m kotoba_whisper_tpu.cli.distill \
  --data_dir "$WORK/filtered" \
  --student "$WORK/student_init" --teacher "$TEACHER" \
  --tokenizer "$TOKENIZER" --output_dir "$WORK/distilled" \
  --per_device_train_batch_size 32 --learning_rate 1e-4 \
  --warmup_steps 500 --num_train_epochs 8 --dtype bfloat16

for ds in common_voice_8_0 jsut_basic5000 reazonspeech_test; do
  [ -d "$DATA_DIR/../$ds" ] || continue
  python -m kotoba_whisper_tpu.cli.eval_short_form \
    --model "$WORK/distilled/final" --tokenizer "$TOKENIZER" \
    --dataset_dir "$DATA_DIR/../$ds" --dataset_name "$ds" --language ja
done
