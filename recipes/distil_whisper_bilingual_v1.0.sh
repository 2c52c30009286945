#!/usr/bin/env bash
# Recipe: bilingual (ja+en) distillation — the distil-whisper-bilingual-v1.0
# flow. Mirrors the reference's three scripts:
#   script/distil_whisper_bilingual_v1.0.{pseudo_labelling,filtering}.sh
#     — per-subset dual-label (transcribe+translate) labelling and
#       per-column WER-10 filtering;
#   script/distil_whisper_bilingual_v1.0.distillation.sh
#     — 8 epochs of `distillation` calls, each on a RANDOMIZED group of
#       5 ja subsets + 3 en subsets with a fresh per-call seed, the next
#       group's data prefetched in background while the current group
#       trains, and weights carried over between calls through the
#       continuously-updated model dir (optimizer state resets per call,
#       num_train_epochs=1 per call).
# Here "subset" = a chunk of CHUNK_TARS tar shards; the Hub download
# prefetch becomes a page-cache warm of the next group's features.npz.
set -euo pipefail

JA_DATA=${JA_DATA:-/data/reazonspeech}
EN_DATA=${EN_DATA:-/data/mls_english}
WORK=${WORK:-work/bilingual_v1.0}
TEACHER=${TEACHER:-/models/whisper-large-v3}
TOKENIZER=${TOKENIZER:-/models/whisper-large-v3}
JA_CHUNKS=${JA_CHUNKS:-20}      # reference: 223 reazon `all` subsets
EN_CHUNKS=${EN_CHUNKS:-12}      # reference: 134 MLS subsets
CHUNK_TARS=${CHUNK_TARS:-50}
EPOCHS=${EPOCHS:-8}
JA_GROUP=${JA_GROUP:-5}         # subsets per distillation call (reference)
EN_GROUP=${EN_GROUP:-3}
WER_THRESHOLD=${WER_THRESHOLD:-10}
SCHEDULE_SEED=${SCHEDULE_SEED:-42}
BATCH=${BATCH:-32}              # per-dataset sub-batch (reference: 64 global)

mkdir -p "$WORK"

# ---- stage 2+3: chunked dual-label pseudo-labelling + multi-column
# filtering (idempotent per chunk; reference pseudo_labelling.sh loops
# subsets the same way) ----
label_and_filter () {  # <data_dir> <out_root> <n_chunks> <lang> <lang_task> <cols>
  local data_dir=$1 out_root=$2 n_chunks=$3 lang=$4 lang_task=$5 cols=$6
  for i in $(seq 0 $((n_chunks - 1))); do
    local lo=$((i * CHUNK_TARS)) hi=$(((i + 1) * CHUNK_TARS))
    local out="$out_root/chunk_$i"
    [ -f "$out/filtered/filtered.jsonl" ] && continue   # re-run safe
    python -m kotoba_whisper_tpu.cli.pseudo_label \
      --dataset_dir "$data_dir" --output_dir "$out/labels" \
      --model "$TEACHER" --tokenizer "$TOKENIZER" --batch_size 32 \
      --chunk_lo "$lo" --chunk_hi "$hi" \
      --text_lang_task "$lang_task"
    python -m kotoba_whisper_tpu.cli.data_filter \
      --dataset_dir "$data_dir" --labels "$out/labels/pseudo_labels.jsonl" \
      --output_dir "$out/filtered" --tokenizer "$TOKENIZER" \
      --language "$lang" --wer_threshold "$WER_THRESHOLD" \
      --timestamp_probability 0.2 --condition_on_prev_probability 0.2 \
      --label_column "$cols"
  done
}
label_and_filter "$JA_DATA" "$WORK/ja" "$JA_CHUNKS" ja \
  "ja:transcribe,en:translate" \
  "whisper_transcript/transcribe.ja,whisper_transcript/translate.en"
label_and_filter "$EN_DATA" "$WORK/en" "$EN_CHUNKS" en \
  "en:transcribe,ja:translate" \
  "whisper_transcript/transcribe.en,whisper_transcript/translate.ja"

# ---- stage 4: student init (2-layer decoder) ----
if [ ! -d "$WORK/student_init" ]; then
  python -m kotoba_whisper_tpu.cli.create_student \
    --teacher "$TEACHER" --save_dir "$WORK/student_init" --decoder_layers 2
fi

# ---- stage 5: 8 epochs x randomized subset groups ----
# Each call trains one (5-ja, 3-en) group for one pass with a fresh seed;
# weights continue from the previous call's export (reference
# distillation.sh: --model_name_or_path == --output_dir == the alias dir).
MODEL="$WORK/student_init"
shuffled () {  # deterministic per-epoch shuffle: <n> <salt>
  seq 0 $(($1 - 1)) | shuf --random-source=<(yes "$SCHEDULE_SEED.$2")
}
join_group () {  # <root> <ids...> -> comma-joined filtered dirs
  local root=$1; shift
  local parts=()
  for id in "$@"; do parts+=("$root/chunk_$id/filtered"); done
  (IFS=,; echo "${parts[*]}")
}
STEPS_PER_EPOCH=$(( JA_CHUNKS / JA_GROUP < EN_CHUNKS / EN_GROUP \
                    ? JA_CHUNKS / JA_GROUP : EN_CHUNKS / EN_GROUP ))
for e in $(seq 0 $((EPOCHS - 1))); do
  mapfile -t JA_ORDER < <(shuffled "$JA_CHUNKS" "ja$e")
  mapfile -t EN_ORDER < <(shuffled "$EN_CHUNKS" "en$e")
  for g in $(seq 0 $((STEPS_PER_EPOCH - 1))); do
    DONE="$WORK/distilled/.done_e${e}_g${g}"
    if [ -f "$DONE" ]; then MODEL="$WORK/distilled/final"; continue; fi
    JA_DIRS=$(join_group "$WORK/ja" "${JA_ORDER[@]:$((g * JA_GROUP)):$JA_GROUP}")
    EN_DIRS=$(join_group "$WORK/en" "${EN_ORDER[@]:$((g * EN_GROUP)):$EN_GROUP}")
    # prefetch the NEXT group's features into the page cache while this
    # group trains (reference: background hf_dataset_download of group g+1)
    if [ $((g + 1)) -lt "$STEPS_PER_EPOCH" ]; then
      NEXT_JA=$(join_group "$WORK/ja" "${JA_ORDER[@]:$(((g + 1) * JA_GROUP)):$JA_GROUP}")
      NEXT_EN=$(join_group "$WORK/en" "${EN_ORDER[@]:$(((g + 1) * EN_GROUP)):$EN_GROUP}")
      ( IFS=,; for d in $NEXT_JA $NEXT_EN; do
          cat "$d/features.npz" > /dev/null 2>&1 || true
        done ) &
    fi
    SEED=$(( (e * 7919 + g * 104729 + SCHEDULE_SEED) % 100000 ))
    python -m kotoba_whisper_tpu.cli.distill_bilingual \
      --dataset "ja:$JA_DIRS:transcribe.ja+translate.en:kl" \
      --dataset "en:$EN_DIRS:transcribe.en+translate.ja:nokl" \
      --student "$MODEL" --teacher "$TEACHER" \
      --tokenizer "$TOKENIZER" --output_dir "$WORK/distilled" \
      --per_dataset_batch_size "$BATCH" --learning_rate 1e-4 \
      --max_label_length 128 --logging_steps 25 \
      --num_train_epochs 1 --seed "$SEED" --dtype bfloat16
    wait   # reap the prefetch job
    MODEL="$WORK/distilled/final"
    touch "$DONE"
  done
done

# ---- stage 6: eval both languages ----
for ds in common_voice_8_0 jsut_basic5000 reazonspeech_test; do
  [ -d "$JA_DATA/../$ds" ] || continue
  python -m kotoba_whisper_tpu.cli.eval_short_form \
    --model "$MODEL" --tokenizer "$TOKENIZER" \
    --dataset_dir "$JA_DATA/../$ds" --dataset_name "$ds" --language ja
done
for ds in librispeech_test_clean voxpopuli_test; do
  [ -d "$EN_DATA/../$ds" ] || continue
  python -m kotoba_whisper_tpu.cli.eval_short_form \
    --model "$MODEL" --tokenizer "$TOKENIZER" \
    --dataset_dir "$EN_DATA/../$ds" --dataset_name "$ds" --language en
done
