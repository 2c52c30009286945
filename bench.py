"""Benchmark: teacher pseudo-labelling throughput (audio-seconds/s/chip).

The BASELINE.json north-star metric. Runs whisper-large-v3 (random weights —
throughput is weight-independent) over batched 30 s utterances: on-device
log-mel -> encoder -> greedy decode for a fixed 48 tokens (early-exit
disabled so the measurement is deterministic; real pseudo-labels average ~25
tokens per misc/data_statistics.json, so 48 is conservative).

Robustness: this environment's remote-compile service can be slow or wedge
on the largest programs, so the headline config (int8 KV, B=48 — measured
748 audio-s/s/chip) runs in a watchdog subprocess; on timeout/failure the
bench falls back to the exact-bf16 B=32 config (measured 482) rather than
hanging the harness.

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
import os
import subprocess
import sys
import time

import numpy as np

CONFIGS = {
    # name: (batch, n_tokens, trials, kv_dtype)
    "int4-96": (96, 48, 3, "int4"),
    "int4-64": (64, 48, 3, "int4"),
    "int4-48": (48, 48, 3, "int4"),
    "int8-64": (64, 48, 3, "int8"),
    "int8-48": (48, 48, 3, "int8"),
    "bf16-32": (32, 48, 3, "compute"),
    "cpu-smoke": (2, 16, 1, "compute"),
}
BASELINE_RATE = 30.0 / 0.184  # reference large-v3, 30 s utterance, cuda:0
WATCHDOG_SECS = int(os.environ.get("KWT_BENCH_TIMEOUT", "1200"))


def run_config(name: str) -> None:
    import jax
    import jax.numpy as jnp

    from kotoba_whisper_tpu.core.config import (
        FeatureConfig,
        PRESETS,
        SpecialTokens,
    )
    from kotoba_whisper_tpu.decode.greedy import GenerateOptions, generate_greedy
    from kotoba_whisper_tpu.models import whisper
    from kotoba_whisper_tpu.ops.mel import log_mel_spectrogram

    batch, n_tokens, trials, kv_dtype = CONFIGS[name]
    # diagnosis overrides (not used by the driver): KWT_BENCH_TOKENS to
    # shrink the decode loop, KWT_BENCH_ATTN to pin the attention impl
    n_tokens = int(os.environ.get("KWT_BENCH_TOKENS", n_tokens))
    cfg = PRESETS["large-v3" if name != "cpu-smoke" else "test-tiny"]

    st = SpecialTokens.for_vocab(cfg.vocab_size)
    feat = FeatureConfig(n_mels=cfg.num_mel_bins)

    params = whisper.init_params(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    if os.environ.get("KWT_BENCH_FUSE", "1") != "0":
        from kotoba_whisper_tpu.models.optimized import fuse_for_inference

        params = fuse_for_inference(params)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((batch, feat.n_samples)).astype(np.float32) * 0.1
    )

    prompt = (st.sot, st.lang_begin + 6, st.transcribe)  # <|ja|> transcribe
    opts = GenerateOptions(prompt_ids=prompt, max_length=len(prompt) + n_tokens)
    # fixed-length decode: point the early-exit at an unreachable token id
    st_bench = dataclasses.replace(st, eot=-1)

    # Encoder attention impl: the single-step Pallas kernel wins at B<=32
    # (1133 -> 868 ms) but XLA's attention turns sublinear at B>=48 (1029 ms
    # @ B=48, beating the kernel's linear 26.9 ms/sample) — so the headline
    # B=48 config stays on XLA (docs/DESIGN.md encoder ledger).
    attn_impl = os.environ.get(
        "KWT_BENCH_ATTN", "pallas" if batch <= 32 and name != "cpu-smoke" else "xla"
    )

    def pipeline(params, audio):
        mel = log_mel_spectrogram(audio, feat).astype(jnp.bfloat16)
        return generate_greedy(
            params, cfg, mel, opts, st_bench,
            compute_dtype=jnp.bfloat16, kv_dtype=kv_dtype,
            attn_impl=attn_impl,
        )

    tokens = pipeline(params, audio)  # warmup/compile
    jax.block_until_ready(tokens)

    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(pipeline(params, audio))
        times.append(time.perf_counter() - t0)
    dt = float(np.mean(times))

    value = batch * feat.chunk_length_s / dt
    print(
        json.dumps(
            {
                "metric": "pseudo_label_audio_seconds_per_s_per_chip",
                "value": round(value, 2),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(value / BASELINE_RATE, 3),
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--config":
        run_config(sys.argv[2])
        return

    import jax

    if jax.devices()[0].platform != "tpu":
        run_config("cpu-smoke")
        return

    # a second attempt at the same config gets a fresh process/axon
    # session, which clears transient remote-compile wedges
    for name in ("int8-48", "bf16-32", "bf16-32"):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--config", name],
                timeout=WATCHDOG_SECS,
                capture_output=True,
                text=True,
            )
            for line in out.stdout.splitlines():
                if line.startswith('{"metric"'):
                    print(line)
                    return
            print(
                f"bench config {name} produced no record "
                f"(rc={out.returncode}): {out.stderr[-400:]}",
                file=sys.stderr,
            )
        except subprocess.TimeoutExpired:
            print(
                f"bench config {name} timed out after {WATCHDOG_SECS}s; "
                "falling back",
                file=sys.stderr,
            )
    raise SystemExit(1)


if __name__ == "__main__":
    main()
