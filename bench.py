"""Benchmark: pseudo-labelling + distillation throughput (audio-s/s/chip).

Four measured configs (each in a watchdog subprocess — this environment's
remote-compile service can wedge on the largest programs, and a fresh
process/axon session clears transient wedges):

- stream-real (HEADLINE): continuous-batching greedy decode
  (decode/streaming.py) of 192 synthetic 30 s windows on whisper-large-v3
  (random weights — throughput is weight-independent), int8 KV, decode
  window 48, refill batches of 16. Per-utterance token budgets are drawn
  from a gamma fit of the ReazonSpeech pseudo-label length distribution
  (token_length mean 18.8, max 165 — /root/reference/misc/
  data_statistics.json `reazonspeech.large`; +6 for prompt/timestamps/eot
  => ~22 median, ~25 mean total tokens). This is the honest number: early
  exit ON, realistic lengths, refill paying the real encoder cost inline.
- fixed-48: the round-1 lockstep configuration (B=48, every row decodes
  exactly 48 tokens, early exit disabled) — kept for cross-round
  comparability.
- train-b8: distillation train step (distil-large-v3 student, large-v3
  teacher logits via the frozen shared encoder, B=8, 128-token labels,
  bf16 + remat), fwd+bwd+AdamW; emits the B=8 continuity row plus the
  promoted round-5 config train-b128-mb16.
- beam-stream: continuous-batching beam search (num_beams=5, 12 groups,
  shared cross-KV, w8a8 + int8 KV) — the production beam path.

Each decode subprocess measures TWO gemm variants from one model setup
and emits a record per variant: the bf16 baseline (`fixed-48`,
`stream-real` — comparable across rounds) and the same pipeline on
int8-quantized dense projections (`fixed-48-w8a8`, `stream-real-w8a8`;
models/quantized.py — measured +8.5% on fixed-48 (an encoder-GEMM win,
see docs/DESIGN.md round-4 attribution) and +12% warm-state on the
stream). The fixed-48 subprocess adds `fixed-64-w8a8` — the widest
lockstep batch the quantized weights leave HBM room for (measured 826
audio-s/s). The headline is the best decode record.

vs_baseline compares the headline against the reference stack's
single-stream 30 s latency on its CUDA GPU (0.184 s -> 163 audio-s/s,
eval_pipeline/runtime_pipeline.jsonl) — the only speed point the reference
publishes; hardware differs, so it is a cross-stack reference, not an A/B.

Every config's value is the BEST (min) of its fenced trials — the
sustained-throughput estimator robust to remote-tunnel hiccups (one
observed 21.9 s outlier on a 10 s stream trial would otherwise halve a
record); every per-trial time is reported in the record's `detail`, so
the spread stays visible in the artifact.

Prints a JSON result line {"metric", "value", "unit", "vs_baseline",
"extra"} INCREMENTALLY — re-emitted after every config that completes — so
a run killed by an outer budget still reports whatever finished (the
driver parses the last JSON line). The headline is the better of
stream-real and fixed-48.

Budgeting (VERDICT r3 #1): each config gets one watchdog attempt sized so
the worst case stays under KWT_BENCH_TOTAL (default 1380 s); fixed-48's
cap covers one cold large-v3 compile. After the first sweep, any config
that timed out or failed gets a SECOND-CHANCE attempt with the remaining
total budget — a first attempt that died mid-sweep still populated the
persistent compile cache for the programs it finished, so the retry
resumes further along instead of abandoning the config. The persistent
XLA compilation cache is ON by default here (KWT_COMPILE_CACHE=off to
disable): large-model compiles cost 5-10 min each through this
environment's remote-compile service, and warm-cache reruns make the
whole bench fit its budget.

`python bench.py --prime` runs every config once with generous per-config
timeouts to populate the compile cache; it is part of the committed
workflow after ANY traced-code change (CLAUDE.md), so the driver's
in-budget run always hits a warm cache. Each config record carries
setup/compile/per-trial timing in `detail` so artifacts are interpretable
without trusting docs (VERDICT r3 #8).

KWT_BENCH_GEMM=int8 switches the decode configs to w8a8 quantized dense
projections (models/quantized.py) on top of int8 KV.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_RATE = 30.0 / 0.184  # reference large-v3, 30 s utterance, cuda:0
TOTAL_SECS = int(os.environ.get("KWT_BENCH_TOTAL", "1380"))
# per-config watchdog caps; sum <= TOTAL_SECS worst case. fixed-48 leads
# and its cap covers one cold large-v3 pipeline compile (~600 s through
# the remote-compile service) — round 3 regressed because the cap was
# shrunk below that (VERDICT r3 #1).
# train cap covers the twin records (B=8 continuity + promoted
# B=128-mb16: ~10 s + ~60 s of trials on a warm cache, plus param init)
CONFIG_CAPS = {"fixed-48": 640, "stream-real": 450, "train-b8": 290,
               "beam-stream": 200}
# minimum useful budget to even attempt a config late in the run
MIN_BUDGET = 90
# per-config timeout in --prime mode (cache population, run manually —
# not under the driver's budget)
PRIME_CAP = int(os.environ.get("KWT_BENCH_PRIME_CAP", "1500"))


def _realistic_stops(n: int, prompt_len: int, rng) -> np.ndarray:
    """Total-token budgets ~ 6 + Gamma(k=3.2, theta=5.9) (see module doc)."""
    text = rng.gamma(3.2, 5.9, size=n)
    return np.clip(prompt_len + 3 + text, 10, 170).astype(np.int64)


def _large_v3_setup():
    import jax
    import jax.numpy as jnp

    from kotoba_whisper_tpu.core.config import (
        FeatureConfig,
        PRESETS,
        SpecialTokens,
    )
    from kotoba_whisper_tpu.models import whisper

    cfg = PRESETS["large-v3"]
    st = SpecialTokens.for_vocab(cfg.vocab_size)
    feat = FeatureConfig(n_mels=cfg.num_mel_bins)
    params = whisper.init_params(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    if os.environ.get("KWT_BENCH_FUSE", "1") != "0":
        from kotoba_whisper_tpu.models.optimized import fuse_for_inference

        params = fuse_for_inference(params)
    if bench_gemm() == "int8":
        from kotoba_whisper_tpu.models.quantized import quantize_for_inference

        params = quantize_for_inference(params)
    return cfg, st, feat, params


def bench_gemm() -> str:
    """Dense-projection dtype for the decode configs: "compute" (bf16) or
    "int8" (w8a8, models/quantized.py — halves decoder weight streaming)."""
    return os.environ.get("KWT_BENCH_GEMM", "compute")


def run_stream_real(smoke: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from kotoba_whisper_tpu.decode.greedy import (
        GenerateOptions,
        transcribe_prompt,
    )
    from kotoba_whisper_tpu.decode.streaming import (
        StreamConfig,
        generate_greedy_streaming,
    )
    from kotoba_whisper_tpu.ops.mel import log_mel_spectrogram

    if smoke:
        from kotoba_whisper_tpu.core.config import (
            FeatureConfig, PRESETS, SpecialTokens,
        )
        from kotoba_whisper_tpu.models import whisper

        cfg = PRESETS["test-tiny"]
        st = SpecialTokens.for_vocab(cfg.vocab_size)
        feat = FeatureConfig(n_mels=cfg.num_mel_bins)
        params = whisper.init_params(jax.random.key(0), cfg)
        n, window, ebatch, kv, max_len = 8, 4, 2, "compute", 24
        dtype = jnp.float32
    else:
        cfg, st, feat, params = _large_v3_setup()
        window = int(os.environ.get("KWT_BENCH_WINDOW", 48))
        ebatch = int(os.environ.get("KWT_BENCH_EBATCH", 16))
        kv = os.environ.get("KWT_BENCH_KV", "int8")
        n, max_len = 192, 176
        dtype = jnp.bfloat16

    import jax

    t_setup = time.perf_counter()
    rng = np.random.default_rng(0)
    # audio uploaded ONCE before timing (input staging overlaps compute in
    # the production pipeline); mel runs ON DEVICE inside the timed window
    # in refill-sized batches, with no host round-trips — the same
    # device-residency discipline as the fixed-48 config. (bench r2 showed
    # per-refill host<->device mel traffic dominating the whole stream on
    # the remote-attached chip.) Staged in bf16 (184 MB, not 368 MB fp32)
    # so the buffer can stay alive across trials without tipping the v5e
    # over next to the full int8 window state.
    audio = jnp.asarray(
        rng.standard_normal((n, feat.n_samples)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)

    def mel_all(a):
        # bf16 residency: the encoder casts to bf16 anyway; the fp32
        # upcast is one ebatch-sized temp (30 MB) inside the loop
        return jnp.concatenate([
            log_mel_spectrogram(
                a[i : i + ebatch].astype(jnp.float32), feat
            ).astype(dtype)
            for i in range(0, a.shape[0], ebatch)
        ])

    prompt = transcribe_prompt(st, st.lang_begin + 6)  # <|ja|> transcribe
    opts = GenerateOptions(prompt_ids=prompt, max_length=max_len)
    stops = _realistic_stops(n, len(prompt), rng)

    scfg = StreamConfig(
        batch=window, encode_batch=ebatch,
        steps_per_round=int(os.environ.get("KWT_BENCH_SPR", "8")),
    )
    # Pallas single-step attention for the refill encoder (1.31x the XLA
    # attention on the isolated encoder pass, docs/DESIGN.md) — the stream
    # is encode-bound at realistic label lengths. Env-switchable because
    # the fixed-48 pipeline measured the OPPOSITE ordering in-pipeline
    # (fused-qkv XLA attention won); see the round-4 tuning-probe note.
    attn = os.environ.get(
        "KWT_BENCH_STREAM_ATTN", "pallas" if not smoke else "xla"
    )
    kw = dict(compute_dtype=dtype, kv_dtype=kv, stream=scfg, stop_at=stops,
              attn_impl=attn)

    trials = 1 if smoke else int(os.environ.get("KWT_BENCH_TRIALS", "3"))

    def measure(name: str, pp, gemm: str, setup_s: float) -> dict:
        # setup_s is passed per-variant: the second (w8a8) variant's setup
        # is its quantize pass only, not the bf16 variant's warmup+trials
        # (ADVICE r4: a single function-level reference point misreported
        # the committed artifact's timing field).
        # warmup/compile on a prefix of the stream
        t_compile = time.perf_counter()
        generate_greedy_streaming(
            pp, cfg, mel_all(audio[: 2 * window]), opts, st, **kw
        )
        compile_s = time.perf_counter() - t_compile
        if not smoke:
            # full-length warmup pass: the prefix warmup compiles the
            # programs but the FIRST full-n stream still paid a one-time
            # allocator/tunnel cost of up to 2x (BENCH_r04 stream
            # trial_s[0]); one uncounted full pass absorbs it so every
            # timed trial is steady-state (VERDICT r4 #3).
            out_w = generate_greedy_streaming(
                pp, cfg, mel_all(audio), opts, st, **kw
            )
            np.asarray(out_w[-1][-1])
            out_w = None
        times = []
        for _ in range(trials):
            t0 = time.perf_counter()
            mels = mel_all(audio)
            out = generate_greedy_streaming(pp, cfg, mels, opts, st, **kw)
            np.asarray(out[-1][-1])  # readback fence (remote-attached chip)
            times.append(time.perf_counter() - t0)
            mels = None
        assert out.shape[0] == n
        dt = float(np.min(times))
        return {
            "config": name,
            "value": round(n * feat.chunk_length_s / dt, 2),
            "detail": {
                "n_utts": n, "window": window, "kv": kv, "gemm": gemm,
                "mean_stop_tokens": round(float(stops.mean()), 1),
                "trial_s": [round(t, 3) for t in times],
                "compile_s": round(compile_s, 1),
                "setup_s": round(setup_s, 1),
            },
        }

    if smoke:
        return measure(
            "stream-real", params, "compute", time.perf_counter() - t_setup
        )
    if bench_gemm() == "int8":
        # explicit env override: whole run already w8a8 — name the record
        # by its actual gemm so it never masquerades as the bf16 baseline
        # config in cross-round comparisons (ADVICE r4).
        return measure(
            "stream-real-w8a8", params, "int8",
            time.perf_counter() - t_setup,
        )
    rec = measure(
        "stream-real", params, "compute", time.perf_counter() - t_setup
    )
    print(json.dumps(rec), flush=True)
    from kotoba_whisper_tpu.models.quantized import quantize_for_inference

    t_q = time.perf_counter()
    qparams = quantize_for_inference(params)
    params = None  # free the bf16 projections before the w8a8 stream runs
    return measure(
        "stream-real-w8a8", qparams, "int8", time.perf_counter() - t_q
    )


def run_fixed48() -> dict:
    """Measures TWO gemm variants from one setup (the ~5 min param-init/
    upload cost is paid once): `fixed-48` stays bf16 dense projections —
    the round-1 cross-round comparability workload — and `fixed-48-w8a8`
    re-runs the identical pipeline on int8-quantized projections
    (models/quantized.py), the measured decode-side int8 win (VERDICT r3
    #2). Both records are emitted; the parent collects every
    '{"config"...' line."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from kotoba_whisper_tpu.decode.greedy import (
        GenerateOptions,
        generate_greedy,
        transcribe_prompt,
    )
    from kotoba_whisper_tpu.models.quantized import quantize_for_inference
    from kotoba_whisper_tpu.ops.mel import log_mel_spectrogram

    cfg, st, feat, params = _large_v3_setup()
    batch = int(os.environ.get("KWT_BENCH_BATCH", 48))
    n_tokens, trials = int(os.environ.get("KWT_BENCH_TOKENS", 48)), 3
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((batch, feat.n_samples)).astype(np.float32) * 0.1
    )
    prompt = transcribe_prompt(st, st.lang_begin + 6)
    opts = GenerateOptions(prompt_ids=prompt, max_length=len(prompt) + n_tokens)
    st_bench = dataclasses.replace(st, eot=-1)  # fixed-length decode
    attn_impl = os.environ.get("KWT_BENCH_ATTN", "xla")

    def pipeline(params, audio):
        mel = log_mel_spectrogram(audio, feat).astype(jnp.bfloat16)
        return generate_greedy(
            params, cfg, mel, opts, st_bench,
            compute_dtype=jnp.bfloat16, kv_dtype="int8", attn_impl=attn_impl,
        )

    def measure(name: str, pp, gemm: str) -> dict:
        t_compile = time.perf_counter()
        out = pipeline(pp, audio)
        np.asarray(out[-1, -1])  # readback fence; compile included here
        compile_s = time.perf_counter() - t_compile
        times = []
        for _ in range(trials):
            t0 = time.perf_counter()
            out = pipeline(pp, audio)
            np.asarray(out[-1, -1])
            times.append(time.perf_counter() - t0)
        dt = float(np.min(times))
        return {
            "config": name,
            "value": round(batch * feat.chunk_length_s / dt, 2),
            "detail": {
                "kv": "int8", "gemm": gemm, "attn": attn_impl,
                "trial_s": [round(t, 3) for t in times],
                "compile_s": round(compile_s, 1),
            },
        }

    if bench_gemm() == "int8" or batch != 48:
        # explicit env override: a single-variant run, named by its actual
        # shape/gemm so it never overwrites the baseline config's record
        # (ADVICE r4 — cross-round comparability of named records).
        name = f"fixed-{batch}" + ("-w8a8" if bench_gemm() == "int8" else "")
        return measure(name, params, bench_gemm())
    rec = measure("fixed-48", params, "compute")
    print(json.dumps(rec), flush=True)
    qparams = quantize_for_inference(params)
    params = None  # free bf16 projections; B=64 needs the headroom
    rec = measure("fixed-48-w8a8", qparams, "int8")
    print(json.dumps(rec), flush=True)

    # Widest lockstep batch that fits with quantized weights: the
    # ~5 ms/step batch-independent decode residual and the per-step head
    # amortize over more rows (measured 826 vs 787 audio-s/s, round 4).
    batch = 64
    audio = jnp.asarray(
        rng.standard_normal((batch, feat.n_samples)).astype(np.float32) * 0.1
    )
    return measure("fixed-64-w8a8", qparams, "int8")


def run_train_b8() -> dict:
    """Emits the B=8 continuity row and — when no env overrides are set —
    the promoted tuned config `train-b128-mb16` from the same setup
    (round-5 batch x microbatch sweep, docs/DESIGN.md: the knee of the
    step-overhead amortization curve, 785 vs 686 audio-s/s)."""
    import jax
    import jax.numpy as jnp

    from kotoba_whisper_tpu.core.config import FeatureConfig, PRESETS
    from kotoba_whisper_tpu.models import whisper
    from kotoba_whisper_tpu.train import distill, optim

    t_cfg = PRESETS["large-v3"]
    s_cfg = PRESETS["distil-large-v3"]
    feat = FeatureConfig(n_mels=t_cfg.num_mel_bins)
    override = (
        "KWT_BENCH_TRAIN_BATCH" in os.environ
        or "KWT_BENCH_TRAIN_MB" in os.environ
    )
    batch = int(os.environ.get("KWT_BENCH_TRAIN_BATCH", "8"))
    mb = int(os.environ.get("KWT_BENCH_TRAIN_MB", "1"))
    label_len, trials = 128, 3

    teacher = whisper.init_params(jax.random.key(0), t_cfg)
    teacher = jax.tree.map(lambda x: x.astype(jnp.bfloat16), teacher)
    rng = np.random.default_rng(0)

    def fence(state, metrics):
        # readback fence: block_until_ready alone does not fence
        # device-resident-input programs on the remote-attached chip.
        # One element of an updated param leaf fences the optimizer
        # update, not just the loss computation.
        np.asarray(jax.tree.leaves(metrics)[0])
        leaf = jax.tree.leaves(state.params)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    def measure(batch: int, mb: int, mb_tag: bool) -> dict:
        # fresh student per variant: the fused train step DONATES its
        # state, so the first variant's updates delete the init arrays —
        # reusing them for the second variant's init_train_state raises
        # "Array has been deleted"
        student = whisper.init_params(jax.random.key(1), s_cfg)
        dc = distill.DistillConfig(
            kl_weight=1.0, temperature=2.0, freeze_encoder=True,
            share_hidden_states=True, num_microbatches=mb,
            compute_dtype=jnp.bfloat16,
        )
        tx, sched = optim.make_optimizer(student, lr=1e-4, warmup_steps=500)
        state = distill.init_train_state(student, tx)
        step_fn = distill.jit_train_step(
            distill.make_train_step(s_cfg, t_cfg, dc, tx, sched)
        )
        ids = rng.integers(10, 5000, size=(batch, label_len))
        labels = ids.copy()
        labels[:, -16:] = -100
        dii = np.concatenate(
            [np.full((batch, 1), s_cfg.decoder_start_token_id),
             ids[:, :-1]], axis=1,
        )
        data = {
            "input_features": jnp.asarray(
                rng.standard_normal((batch, feat.n_mels, feat.n_frames)),
                jnp.bfloat16,
            ),
            "labels": jnp.asarray(labels),
            "decoder_input_ids": jnp.asarray(dii),
        }
        t_compile = time.perf_counter()
        state, metrics = step_fn(state, teacher, data)  # compile
        fence(state, metrics)
        compile_s = time.perf_counter() - t_compile
        # Steady-state methodology: training dispatches steps back-to-back
        # with no host readbacks, so each trial chains `chain` steps and
        # fences ONCE — a per-step readback serializes the remote
        # tunnel's dispatch latency into every step and under-reports
        # sustained throughput by ~11% (measured: 389 -> 350 ms/step).
        chain = int(os.environ.get("KWT_BENCH_TRAIN_CHAIN", "4"))
        times = []
        for _ in range(trials):
            t0 = time.perf_counter()
            for _ in range(chain):
                state, metrics = step_fn(state, teacher, data)
            fence(state, metrics)
            times.append((time.perf_counter() - t0) / chain)
        dt = float(np.min(times))
        name = f"train-b{batch}" + (f"-mb{mb}" if mb_tag else "")
        return {
            "config": name,
            "value": round(batch * feat.chunk_length_s / dt, 2),
            "detail": {
                "microbatches": mb,
                "trial_s": [round(t, 3) for t in times],
                "chained_steps": chain,
                "compile_s": round(compile_s, 1),
            },
        }

    if override:
        # explicit env override: single record named by its shape
        return measure(batch, mb, mb_tag=mb > 1)
    rec = measure(8, 1, mb_tag=False)       # continuity row
    print(json.dumps(rec), flush=True)
    return measure(128, 16, mb_tag=True)    # promoted tuned config


def run_stream_beam(smoke: bool = False) -> dict:
    """Continuous-batching BEAM decode (num_beams=5) at the measured
    round-5 sweet spot: 12 groups x 5 beams (W=60), E=6 refills, w8a8 +
    int8 KV, shared cross-KV (decode/streaming_beam.py). The reference
    invokes beam via generate(num_beams=N), run_pseudo_labelling.py:
    302-311; this is its production-throughput counterpart."""
    import jax
    import jax.numpy as jnp

    from kotoba_whisper_tpu.decode.greedy import (
        GenerateOptions,
        transcribe_prompt,
    )
    from kotoba_whisper_tpu.decode.streaming_beam import (
        BeamStreamConfig,
        generate_beam_streaming,
    )
    from kotoba_whisper_tpu.ops.mel import log_mel_spectrogram

    if smoke:
        from kotoba_whisper_tpu.core.config import (
            FeatureConfig, PRESETS, SpecialTokens,
        )
        from kotoba_whisper_tpu.models import whisper

        cfg = PRESETS["test-tiny"]
        st = SpecialTokens.for_vocab(cfg.vocab_size)
        feat = FeatureConfig(n_mels=cfg.num_mel_bins)
        params = whisper.init_params(jax.random.key(0), cfg)
        n, g, k, e, max_len = 4, 2, 2, 1, 20
        dtype = jnp.float32
    else:
        from kotoba_whisper_tpu.models.quantized import quantize_for_inference

        cfg, st, feat, params = _large_v3_setup()
        if bench_gemm() != "int8":
            params = quantize_for_inference(params)  # w8a8 is the config
        g = int(os.environ.get("KWT_BENCH_BEAM_GROUPS", "12"))
        k, e = 5, int(os.environ.get("KWT_BENCH_BEAM_EBATCH", "6"))
        n, max_len = 96, 176
        dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((n, feat.n_samples)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16 if not smoke else jnp.float32)

    def mel_all(a, eb=16):
        return jnp.concatenate([
            log_mel_spectrogram(
                a[i : i + eb].astype(jnp.float32), feat
            ).astype(dtype)
            for i in range(0, a.shape[0], eb)
        ])

    prompt = transcribe_prompt(st, st.lang_begin + 6)
    opts = GenerateOptions(prompt_ids=prompt, max_length=max_len)
    stops = _realistic_stops(n, len(prompt), rng) if not smoke else None
    scfg = BeamStreamConfig(
        groups=g, num_beams=k, encode_batch=e, steps_per_round=8,
    )
    kw = dict(compute_dtype=dtype, kv_dtype="int8" if not smoke else
              "compute", stream=scfg, stop_at=stops)

    t0 = time.perf_counter()
    generate_beam_streaming(
        params, cfg, mel_all(audio[: 2 * g]), opts, st, **kw
    )
    compile_s = time.perf_counter() - t0
    trials = 1 if smoke else int(os.environ.get("KWT_BENCH_TRIALS", "2"))
    times = []
    out = None
    for _ in range(trials):
        t0 = time.perf_counter()
        out, _scores = generate_beam_streaming(
            params, cfg, mel_all(audio), opts, st, **kw
        )
        np.asarray(out[-1][-1])
        times.append(time.perf_counter() - t0)
    assert out.shape[0] == n
    dt = float(np.min(times))
    # env-override runs are named by their geometry so they never
    # masquerade as the baseline config (ADVICE r4 lesson)
    name = "beam-stream-w8a8"
    if not smoke and (g, e) != (12, 6):
        name += f"-g{g}e{e}"
    return {
        "config": name,
        "value": round(n * feat.chunk_length_s / dt, 2),
        "detail": {
            "n_utts": n, "groups": g, "num_beams": k, "encode_batch": e,
            "kv": "int8", "gemm": "int8",
            "trial_s": [round(t, 3) for t in times],
            "compile_s": round(compile_s, 1),
        },
    }


RUNNERS = {
    "stream-real": run_stream_real,
    "fixed-48": run_fixed48,
    "train-b8": run_train_b8,
    "beam-stream": run_stream_beam,
}


def _emit(headline: float, extra: dict) -> None:
    print(json.dumps({
        "metric": "pseudo_label_audio_seconds_per_s_per_chip",
        "value": headline,
        "unit": "audio-s/s/chip",
        "vs_baseline": round(headline / BASELINE_RATE, 3),
        "extra": extra,
    }))


def _headline(extra: dict) -> float | None:
    """Best decode config (VERDICT r2 #2: headline must match the winning
    config); fall back to train if none ran. Matches by prefix so
    env-override record names (fixed-64-w8a8, stream-real-w8a8, ...)
    count too."""
    vals = [
        rec["value"] for n, rec in extra.items()
        if n.startswith(("fixed-", "stream-"))
    ]
    if vals:
        return max(vals)
    train = [
        rec["value"] for n, rec in extra.items() if n.startswith("train-")
    ]
    return max(train) if train else None


def _expected_records() -> dict:
    """Record names each subprocess is expected to emit, derived from the
    active env overrides (ADVICE r4: a static set made the second-chance
    pass re-run override configs forever without ever satisfying it)."""
    gemm_int8 = os.environ.get("KWT_BENCH_GEMM") == "int8"
    batch = int(os.environ.get("KWT_BENCH_BATCH", 48))
    if gemm_int8 or batch != 48:
        fixed = (f"fixed-{batch}" + ("-w8a8" if gemm_int8 else ""),)
    else:
        fixed = ("fixed-48", "fixed-48-w8a8", "fixed-64-w8a8")
    stream = (
        ("stream-real-w8a8",) if gemm_int8
        else ("stream-real", "stream-real-w8a8")
    )
    if ("KWT_BENCH_TRAIN_BATCH" in os.environ
            or "KWT_BENCH_TRAIN_MB" in os.environ):
        tb = int(os.environ.get("KWT_BENCH_TRAIN_BATCH", "8"))
        tm = int(os.environ.get("KWT_BENCH_TRAIN_MB", "1"))
        train = (f"train-b{tb}" + (f"-mb{tm}" if tm > 1 else ""),)
    else:
        train = ("train-b8", "train-b128-mb16")
    return {"fixed-48": fixed, "stream-real": stream, "train-b8": train,
            "beam-stream": ("beam-stream-w8a8",)}


def main() -> None:
    # Compile cache ON by default for this process and all children (the
    # opt-out stays available). Round 2 shipped no number because every
    # config recompiled cold through the remote-compile service.
    os.environ.setdefault("KWT_COMPILE_CACHE", "on")

    if len(sys.argv) > 1 and sys.argv[1] == "--config":
        from kotoba_whisper_tpu.utils.backend import enable_compilation_cache

        enable_compilation_cache()
        print(json.dumps(RUNNERS[sys.argv[2]]()), flush=True)
        return

    if len(sys.argv) > 1 and sys.argv[1] == "--prime":
        # Cache population: run each config once with a generous timeout so
        # every program lands in the persistent compile cache. Part of the
        # committed workflow after any traced-code change (VERDICT r3 #1a);
        # the driver's budgeted run then always hits a warm cache.
        names = sys.argv[2:] or list(RUNNERS)
        for name in names:
            t0 = time.monotonic()
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--config", name],
                    timeout=PRIME_CAP, capture_output=True, text=True,
                )
                recs = [json.loads(ln) for ln in out.stdout.splitlines()
                        if ln.startswith('{"config"')]
                print(json.dumps({
                    "prime": name, "rc": out.returncode,
                    "wall_s": round(time.monotonic() - t0, 1),
                    "records": recs,
                }), flush=True)
                if not recs:
                    print(out.stderr[-600:], file=sys.stderr)
            except subprocess.TimeoutExpired:
                print(json.dumps({
                    "prime": name, "timeout": True,
                    "wall_s": round(time.monotonic() - t0, 1),
                }), flush=True)
        return

    import jax

    if jax.devices()[0].platform != "tpu":
        rec = run_stream_real(smoke=True)
        _emit(rec["value"], {"note": "cpu smoke (no TPU visible)", **rec})
        return

    t_start = time.monotonic()
    order = ("fixed-48", "stream-real", "train-b8", "beam-stream")
    extra: dict = {}

    def collect(stdout: str | bytes | None, t_a: float) -> list:
        if stdout is None:
            return []
        if isinstance(stdout, bytes):
            stdout = stdout.decode(errors="replace")
        recs = [json.loads(line) for line in stdout.splitlines()
                if line.startswith('{"config"')]
        # a subprocess may emit several configs (gemm variants)
        for rec in recs:
            rec.setdefault("detail", {})["wall_s"] = round(
                time.monotonic() - t_a, 1
            )
            extra[rec["config"]] = rec
        return recs

    def attempt(name: str, budget: float) -> None:
        t_a = time.monotonic()
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--config", name],
                timeout=budget, capture_output=True, text=True,
            )
            if not collect(out.stdout, t_a):
                print(
                    f"bench {name} produced no record (rc={out.returncode}):"
                    f" {out.stderr[-400:]}", file=sys.stderr,
                )
        except subprocess.TimeoutExpired as e:
            # records emitted before the kill still count (each variant
            # prints + flushes as it completes)
            got = collect(e.stdout, t_a)
            print(
                f"bench {name} timed out ({budget:.0f}s); "
                f"salvaged {len(got)} record(s)", file=sys.stderr,
            )
        # emit after EVERY config so a killed run still reports (r2 fix)
        h = _headline(extra)
        if h is not None:
            _emit(h, dict(extra))

    for i, name in enumerate(order):
        # budget = cap, shrunk so every remaining config keeps MIN_BUDGET
        elapsed = time.monotonic() - t_start
        reserve = MIN_BUDGET * (len(order) - i - 1)
        budget = min(CONFIG_CAPS[name], TOTAL_SECS - elapsed - reserve)
        if budget < MIN_BUDGET:
            print(f"bench {name} skipped (out of budget)", file=sys.stderr)
            continue
        attempt(name, budget)

    # Second-chance pass (VERDICT r3 #1b): any config that timed out or
    # failed gets the remaining TOTAL budget instead of leaving it unspent.
    # Its first attempt populated the persistent compile cache up to where
    # it died, so the retry resumes further along.
    expected = _expected_records()
    for name in order:
        if all(c in extra for c in expected[name]):
            continue
        remaining = TOTAL_SECS - (time.monotonic() - t_start)
        if remaining < MIN_BUDGET:
            break
        print(
            f"bench {name} second-chance attempt ({remaining:.0f}s left)",
            file=sys.stderr,
        )
        attempt(name, remaining)

    if _headline(extra) is None:
        raise SystemExit("no bench config completed")


if __name__ == "__main__":
    main()
