"""Guards for bench.py — the driver-run artifact generator.

A broken bench means a lost round regardless of framework quality
(rounds 2 and 3 both shipped regressed artifacts for bench-process
reasons), so its CPU-reachable surface is pinned here: the smoke
runner end-to-end, the headline rule, and the stop-distribution fit.
"""
import json
import subprocess
import sys

import numpy as np
import pytest


def test_realistic_stops_distribution():
    from bench import _realistic_stops

    rng = np.random.default_rng(0)
    stops = _realistic_stops(10_000, prompt_len=4, rng=rng)
    # gamma(3.2, 5.9) + prompt + 3 => ~25.9 mean total tokens, clipped
    assert 24 < stops.mean() < 28
    assert stops.min() >= 10 and stops.max() <= 170
    # deterministic under a fixed seed (the bench's comparability basis)
    stops2 = _realistic_stops(10_000, 4, np.random.default_rng(0))
    np.testing.assert_array_equal(stops, stops2)


def test_headline_rule():
    """Headline = best decode config (incl. w8a8 twins); train-only
    fallback; None when nothing ran (VERDICT r2 #2 semantics)."""
    from bench import _headline

    assert _headline({}) is None
    assert _headline({"train-b8": {"value": 5.0}}) == 5.0
    extra = {
        "fixed-48": {"value": 725.0},
        "fixed-48-w8a8": {"value": 787.0},
        "stream-real": {"value": 531.0},
        "stream-real-w8a8": {"value": 597.0},
        "train-b8": {"value": 9999.0},  # train never beats a decode config
    }
    assert _headline(extra) == 787.0
    # env-override record names still count as decode configs
    assert _headline({"fixed-64-w8a8": {"value": 826.0},
                      "train-b16": {"value": 9999.0}}) == 826.0
    assert _headline({"train-b16": {"value": 701.0}}) == 701.0


def test_expected_records_follow_env(monkeypatch):
    """The second-chance pass must expect the record names the overridden
    subprocess actually emits (ADVICE r4: a static set re-ran override
    configs forever and mis-filed their records)."""
    from bench import _expected_records

    for var in ("KWT_BENCH_GEMM", "KWT_BENCH_BATCH",
                "KWT_BENCH_TRAIN_BATCH", "KWT_BENCH_TRAIN_MB"):
        monkeypatch.delenv(var, raising=False)
    exp = _expected_records()
    assert exp["fixed-48"] == ("fixed-48", "fixed-48-w8a8",
                               "fixed-64-w8a8")
    assert exp["stream-real"] == ("stream-real", "stream-real-w8a8")
    assert exp["train-b8"] == ("train-b8", "train-b128-mb16")

    monkeypatch.setenv("KWT_BENCH_GEMM", "int8")
    monkeypatch.setenv("KWT_BENCH_BATCH", "64")
    monkeypatch.setenv("KWT_BENCH_TRAIN_BATCH", "16")
    exp = _expected_records()
    assert exp["fixed-48"] == ("fixed-64-w8a8",)
    assert exp["stream-real"] == ("stream-real-w8a8",)
    assert exp["train-b8"] == ("train-b16",)
    monkeypatch.setenv("KWT_BENCH_TRAIN_MB", "2")
    assert _expected_records()["train-b8"] == ("train-b16-mb2",)


def test_stream_smoke_runner():
    """run_stream_real(smoke=True) — the CPU path the driver hits on
    non-TPU hosts — produces a well-formed record."""
    import jax

    rec = __import__("bench").run_stream_real(smoke=True)
    assert rec["config"] == "stream-real"
    assert rec["value"] > 0
    assert rec["detail"]["n_utts"] == 8
    assert len(rec["detail"]["trial_s"]) == 1


@pytest.mark.slow
def test_bench_cli_smoke_subprocess():
    """`python bench.py` on a CPU-forced interpreter emits the final
    JSON line with metric/value/unit/vs_baseline — the driver contract."""
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import bench; bench.main()"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, out.stderr[-500:]
    rec = json.loads(lines[-1])
    assert rec["metric"] == "pseudo_label_audio_seconds_per_s_per_chip"
    assert rec["value"] > 0 and rec["unit"] == "audio-s/s/chip"
    assert "vs_baseline" in rec


@pytest.mark.slow
def test_dec_exp_harness_smoke():
    """tools/dec_exp.py (the decode-step attribution harness) runs its
    ablation variants end-to-end on the tiny preset and emits per-variant
    JSON records."""
    out = subprocess.run(
        [sys.executable, "tools/dec_exp.py", "--preset", "test-tiny",
         "--batch", "2", "--steps", "2", "--trials", "1",
         "--variants", "full,no_head"],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
        env={**__import__("os").environ, "KWT_PLATFORM": "cpu"},
    )
    recs = [json.loads(ln) for ln in out.stdout.splitlines()
            if ln.startswith("{")]
    assert recs, out.stderr[-500:]
    final = recs[-1]
    assert final["full"]["per_step_ms"] > 0
    assert final["no_head"]["per_step_ms"] > 0


def test_beam_stream_smoke_runner():
    """run_stream_beam(smoke=True) — CPU path — well-formed record."""
    rec = __import__("bench").run_stream_beam(smoke=True)
    assert rec["config"] == "beam-stream-w8a8"
    assert rec["value"] > 0
    assert rec["detail"]["num_beams"] == 2


def test_expected_records_include_beam(monkeypatch):
    from bench import _expected_records

    for var in ("KWT_BENCH_GEMM", "KWT_BENCH_BATCH",
                "KWT_BENCH_TRAIN_BATCH", "KWT_BENCH_TRAIN_MB"):
        monkeypatch.delenv(var, raising=False)
    assert _expected_records()["beam-stream"] == ("beam-stream-w8a8",)
