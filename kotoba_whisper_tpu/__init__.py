"""kotoba_whisper_tpu — a TPU-native Whisper distillation framework.

Built from scratch on JAX/XLA/Pallas/pjit with the capabilities of
kotoba-tech/kotoba-whisper (see SURVEY.md): teacher pseudo-labelling with
greedy/beam decode and timestamp tokens, WER-threshold dataset filtering,
and CE+KL student distillation with maximally-spaced layer initialization,
plus CER/WER and speed evaluation harnesses.

Layout:
  core/      mesh & runtime: device mesh, shardings, config tree, RNG
  ops/       compute kernels: log-mel, attention (Pallas flash), conv stem
  models/    Whisper encoder/decoder (functional pytrees), HF import/export,
             student-from-teacher init
  decode/    greedy + beam generation, timestamp rules, long-form chunking
  tokenizer/ byte-level BPE (C++ core with ctypes bindings) + Whisper specials
  data/      ReazonSpeech tar/TSV reader, collators, WER filtering
  train/     distillation loss/step, optimizer, checkpointing
  eval/      CER/WER harness, normalizers, speed eval
  parallel/  collective helpers, multihost utilities
  cli/       five pipeline-stage drivers mirroring the reference scripts
"""

__version__ = "0.1.0"
