#!/usr/bin/env bash
# Recipe: latency benchmark sweep (runtime_pipeline.jsonl rows).
#
# Mirrors script/baseline_evaluation_speed.sh: durations {10,30,60,300}s of
# synthetic audio x attention implementations x model zoo, n-trial mean/std
# with warmup discard. The reference sweeps sdpa vs flash-attn-2; the TPU
# equivalents are the XLA and Pallas attention paths (--attn).
#
# A measured v5e-1 table (large-v3 + distil student, bf16 and int8-KV+w8a8
# serving configs) is committed at eval_pipeline/runtime_pipeline.tpu-v5e.jsonl
# with the BASELINE.md comparison against the reference's cuda:0 numbers.
# Pivot it with: python -m kotoba_whisper_tpu report \
#   --metric_jsonl eval_pipeline/runtime_pipeline.tpu-v5e.jsonl --runtime
set -euo pipefail

MODELS=${MODELS:-/models/whisper-large-v3}
TOKENIZER=${TOKENIZER:-/models/whisper-large-v3}
N_TRIALS=${N_TRIALS:-10}

for attn in pallas xla; do
  for m in $MODELS; do
    python -m kotoba_whisper_tpu.cli.eval_speed \
      --model "$m" --tokenizer "$TOKENIZER" \
      --durations 10,30,60,300 --n_trials "$N_TRIALS" --attn "$attn"
  done
done

# int8 KV variant rows for the flagship config
for m in $MODELS; do
  python -m kotoba_whisper_tpu.cli.eval_speed \
    --model "$m" --tokenizer "$TOKENIZER" \
    --durations 10,30,60,300 --n_trials "$N_TRIALS" --kv_dtype int8
done
