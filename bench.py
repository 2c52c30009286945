"""Benchmark: teacher pseudo-labelling throughput (audio-seconds/s/chip).

The BASELINE.json north-star metric. Runs whisper-large-v3 (random weights —
throughput is weight-independent) over batched 30 s utterances: on-device
log-mel -> encoder -> greedy decode for a fixed 48 tokens (early-exit
disabled so the measurement is deterministic; real pseudo-labels average ~25
tokens per misc/data_statistics.json, so 48 is conservative).

vs_baseline compares against the reference stack's single-stream latency for
30 s audio on its CUDA GPU (0.184 s -> 163 audio-s/s,
eval_pipeline/runtime_pipeline.jsonl) — the only speed number the reference
publishes; hardware differs, so this is a cross-stack reference point, not a
controlled A/B.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kotoba_whisper_tpu.utils.backend import enable_compilation_cache

    enable_compilation_cache()

    from kotoba_whisper_tpu.core.config import (
        FeatureConfig,
        PRESETS,
        SpecialTokens,
    )
    from kotoba_whisper_tpu.decode.greedy import GenerateOptions, generate_greedy
    from kotoba_whisper_tpu.models import whisper
    from kotoba_whisper_tpu.ops.mel import log_mel_spectrogram

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        cfg = PRESETS["large-v3"]
        batch, n_tokens, trials = 48, 48, 3
        kv_dtype = "int8"  # per-row-quantized KV cache: halves the decode
        # loop's dominant HBM traffic and frees HBM for B=48; logit
        # perturbation is bounded by tests (argmax-stable on test models)
        # and the flag is opt-in in the production drivers (--kv_dtype)
    else:  # CPU smoke path so the bench always emits a record
        cfg = PRESETS["test-tiny"]
        batch, n_tokens, trials = 2, 16, 1
        kv_dtype = "compute"

    st = SpecialTokens.for_vocab(cfg.vocab_size)
    feat = FeatureConfig(n_mels=cfg.num_mel_bins)

    params = whisper.init_params(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((batch, feat.n_samples)).astype(np.float32) * 0.1
    )

    prompt = (st.sot, st.lang_begin + 6, st.transcribe)  # <|ja|> transcribe
    opts = GenerateOptions(
        prompt_ids=prompt, max_length=len(prompt) + n_tokens
    )
    # fixed-length decode: point the early-exit at an unreachable token id
    st_bench = dataclasses.replace(st, eot=-1)

    def pipeline(params, audio):
        mel = log_mel_spectrogram(audio, feat).astype(jnp.bfloat16)
        return generate_greedy(
            params, cfg, mel, opts, st_bench,
            compute_dtype=jnp.bfloat16, kv_dtype=kv_dtype,
        )

    # warmup/compile
    tokens = pipeline(params, audio)
    jax.block_until_ready(tokens)

    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(pipeline(params, audio))
        times.append(time.perf_counter() - t0)
    dt = float(np.mean(times))

    audio_seconds = batch * feat.chunk_length_s
    value = audio_seconds / dt
    baseline = 30.0 / 0.184  # reference large-v3, 30 s utterance, cuda:0
    print(
        json.dumps(
            {
                "metric": "pseudo_label_audio_seconds_per_s_per_chip",
                "value": round(value, 2),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
