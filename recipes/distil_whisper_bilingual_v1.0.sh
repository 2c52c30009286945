#!/usr/bin/env bash
# Recipe: bilingual (ja+en) distillation — the distil-whisper-bilingual-v1.0
# flow (script/distil_whisper_bilingual_v1.0.sh): pseudo-label BOTH corpora
# with dual transcribe+translate labels, filter each column, then train the
# bilingual student with the multi-task trainer.
set -euo pipefail

JA_DATA=${JA_DATA:-/data/reazonspeech}
EN_DATA=${EN_DATA:-/data/mls_english}
WORK=${WORK:-work/bilingual_v1.0}
TEACHER=${TEACHER:-/models/whisper-large-v3}
TOKENIZER=${TOKENIZER:-/models/whisper-large-v3}

mkdir -p "$WORK"

# ---- stage 2: dual-label pseudo-labelling (v3 mode) ----
python -m kotoba_whisper_tpu.cli.pseudo_label \
  --dataset_dir "$JA_DATA" --output_dir "$WORK/ja_labels" \
  --model "$TEACHER" --tokenizer "$TOKENIZER" --batch_size 32 \
  --text_lang_task ja:transcribe,en:translate
python -m kotoba_whisper_tpu.cli.pseudo_label \
  --dataset_dir "$EN_DATA" --output_dir "$WORK/en_labels" \
  --model "$TEACHER" --tokenizer "$TOKENIZER" --batch_size 32 \
  --text_lang_task en:transcribe,ja:translate

# ---- stage 3: per-column filtering ----
for col in transcribe.ja translate.en; do
  python -m kotoba_whisper_tpu.cli.data_filter \
    --dataset_dir "$JA_DATA" --labels "$WORK/ja_labels/pseudo_labels.jsonl" \
    --output_dir "$WORK/ja_filtered_$col" --tokenizer "$TOKENIZER" \
    --language ja --label_column "whisper_transcript/$col"
done
for col in transcribe.en translate.ja; do
  python -m kotoba_whisper_tpu.cli.data_filter \
    --dataset_dir "$EN_DATA" --labels "$WORK/en_labels/pseudo_labels.jsonl" \
    --output_dir "$WORK/en_filtered_$col" --tokenizer "$TOKENIZER" \
    --language en --label_column "whisper_transcript/$col"
done

# ---- stage 4: student ----
python -m kotoba_whisper_tpu.cli.create_student \
  --teacher "$TEACHER" --save_dir "$WORK/student_init" --decoder_layers 2

# ---- stage 5: bilingual distillation (train/distill_multitask.py through
# the library API; a dedicated CLI driver lands with the large-data path) ----
echo "bilingual training: use train/distill_multitask.py (see tests/test_multitask.py)"
