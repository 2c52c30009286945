"""Reporting + add-on tests: markdown pivot, punctuator validation rules,
eval-set layout autodetection."""
import json
import os

import numpy as np
import pytest

from kotoba_whisper_tpu.eval.punctuator import Punctuator, RuleBasedJaPunctuator
from kotoba_whisper_tpu.eval.report import load_metrics, pivot_table


def test_pivot_table(tmp_path):
    path = str(tmp_path / "metric.ja.transcribe.jsonl")
    rows = [
        {"model": "a", "dataset": "d1", "cer_norm": 11.61},
        {"model": "a", "dataset": "d2", "cer_norm": 9.2},
        {"model": "b", "dataset": "d1", "cer_norm": 15.1},
        {"model": "a", "dataset": "d1", "cer_norm": 11.4},  # last wins
    ]
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    table = pivot_table(load_metrics(path), "cer_norm")
    lines = table.splitlines()
    assert lines[0] == "| model | d1 | d2 |"
    assert "| a | 11.4 | 9.2 |" in table
    assert "| b | 15.1 | - |" in table


def test_punctuator_validation():
    p = Punctuator()
    chunks = [
        {"timestamp": (0.0, 1.0), "text": "こんにちは"},
        {"timestamp": (1.0, 2.0), "text": "もう終わり。"},
    ]
    out = p.punctuate(chunks)
    assert out[0]["text"] == "こんにちは。"
    assert out[1]["text"] == "もう終わり。"

    # a punctuate_fn that rewrites content must be rejected
    bad = Punctuator(punctuate_fn=lambda ts: ["全然違う" for _ in ts])
    out2 = bad.punctuate(chunks)
    assert out2[0]["text"] == "こんにちは"


def test_eval_set_autodetect_manifest(tmp_path, rng):
    import struct

    from kotoba_whisper_tpu.data.eval_sets import iter_eval_set

    def wav(a, sr=16000):
        pcm = (np.clip(a, -1, 1) * 32767).astype("<i2").tobytes()
        return struct.pack(
            "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ",
            16, 1, 1, sr, sr * 2, 2, 16, b"data", len(pcm),
        ) + pcm

    (tmp_path / "a.wav").write_bytes(wav(rng.standard_normal(1600) * 0.1))
    (tmp_path / "manifest.jsonl").write_text(
        json.dumps({"audio": "a.wav", "text": "hello"}) + "\n"
    )
    examples = list(iter_eval_set(str(tmp_path)))
    assert len(examples) == 1
    assert examples[0].text == "hello"
    assert len(examples[0].audio) == 1600


def test_prepare_eval_set_roundtrip(tmp_path, rng):
    """manifest layout -> tar+tsv layout -> eval_sets reads it back."""
    import json as _json

    import numpy as np

    from kotoba_whisper_tpu.cli import prepare_eval_set
    from kotoba_whisper_tpu.data.eval_sets import iter_eval_set

    src = tmp_path / "src"
    src.mkdir()
    import struct

    def wav(a, sr=16000):
        pcm = (np.clip(a, -1, 1) * 32767).astype("<i2").tobytes()
        return struct.pack(
            "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ",
            16, 1, 1, sr, sr * 2, 2, 16, b"data", len(pcm),
        ) + pcm

    rows = []
    for i in range(5):
        (src / f"u{i}.wav").write_bytes(wav(rng.standard_normal(800) * 0.1))
        rows.append({"audio": f"u{i}.wav", "text": f"utterance {i}"})
    (src / "manifest.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows)
    )

    dst = str(tmp_path / "dst")
    prepare_eval_set.main([
        "--input", str(src), "--output_dir", dst, "--shard_size", "2",
    ])
    back = list(iter_eval_set(dst))
    assert len(back) == 5
    assert back[0].text == "utterance 0"
    assert len(back[0].audio) == 800
    import os

    assert len([f for f in os.listdir(dst) if f.endswith(".tar")]) == 3


def test_punctuator_reference_validation_rules():
    """Exact port of misc/whisper_add_on/punctuator.py:17-26: reject 'unk'
    outputs; collapse multiple 。 keeping the LAST position."""
    from kotoba_whisper_tpu.eval.punctuator import validate_punctuation

    assert validate_punctuation("raw text", "has unk marker") == "raw text"
    # multiple 。-> keep only the last one; the reference computes the
    # reinsertion index on the ORIGINAL string and applies it to the
    # stripped one (punctuator.py:20-23) — reproduce that exactly
    assert validate_punctuation("ab", "a。b。") == "ab。"
    assert validate_punctuation("abc", "a。b。c") == "abc。"
    # single 。 untouched
    assert validate_punctuation("ab", "ab。") == "ab。"


def test_adjust_by_silence_snaps_to_speech_edges():
    """stable_timestamp.py:60-75 semantics: boundaries inside detected
    silence snap to the nearest speech edge."""
    from kotoba_whisper_tpu.eval.timestamp_repair import (
        adjust_by_silence,
        fix_timestamps,
        nonspeech_sections,
    )

    sr = 16000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    silence = np.zeros(sr, np.float32)
    # [0,1) silence, [1,2) speech, [2,3) silence, [3,4) speech, [4,5) silence
    audio = np.concatenate([silence, tone, silence, tone, silence])

    secs = nonspeech_sections(audio, sr)
    assert len(secs) == 3
    for (a, b), (ea, eb) in zip(secs, [(0, 1), (2, 3), (4, 5)]):
        assert abs(a - ea) < 0.1 and abs(b - eb) < 0.1

    chunks = [
        {"timestamp": (0.2, 2.5), "text": "x"},
        {"timestamp": (2.6, 4.8), "text": "y"},
    ]
    out = adjust_by_silence(chunks, audio, sr)
    (s0, e0), (s1, e1) = out[0]["timestamp"], out[1]["timestamp"]
    assert abs(s0 - 1.0) < 0.1 and abs(e0 - 2.0) < 0.1
    assert abs(s1 - 3.0) < 0.1 and abs(e1 - 4.0) < 0.1

    # boundaries already on speech stay put; tiny silence overlap ignored
    ok = [{"timestamp": (1.05, 1.95), "text": "z"}]
    out2 = adjust_by_silence(ok, audio, sr)
    assert out2[0]["timestamp"] == (1.05, 1.95)

    # full pipeline: None-fill then silence adjustment
    out3 = fix_timestamps(
        [{"timestamp": (0.2, None), "text": "x"},
         {"timestamp": (2.6, 4.8), "text": "y"}],
        audio, sr,
    )
    assert out3[0]["timestamp"][0] >= 0.9


def test_punctuator_from_onnx_adapter():
    """Punctuator.from_onnx drives the `punctuators` package with the
    reference's call shape (punctuator.py:6-30): model.infer over the
    chunk texts, per-chunk segment lists joined to one string, validation
    applied, and NO content guard (the real model is trusted like the
    reference trusts it). The package is stubbed — onnxruntime is not
    installable here; the adapter semantics are what this pins."""
    import sys
    import types

    from kotoba_whisper_tpu.eval.punctuator import Punctuator

    calls = {}

    class FakeModel:
        @classmethod
        def from_pretrained(cls, name):
            calls["model"] = name
            return cls()

        def infer(self, texts):
            calls["texts"] = list(texts)
            # punctuators returns a list of segment-lists per input
            return [[t + "。", ""] for t in texts]

    models_mod = types.ModuleType("punctuators.models")
    models_mod.PunctCapSegModelONNX = FakeModel
    pkg = types.ModuleType("punctuators")
    pkg.models = models_mod
    sys.modules["punctuators"] = pkg
    sys.modules["punctuators.models"] = models_mod
    try:
        p = Punctuator.from_onnx()
        assert calls["model"] == "pcs_47lang"
        assert p.guard_content is False
        chunks = [
            {"text": "こんにちは", "timestamp": (0.0, 1.0)},
            {"text": "おはよう。ござい。ます", "timestamp": (1.0, 2.0)},
        ]
        out = p.punctuate(chunks)
        assert calls["texts"] == ["こんにちは", "おはよう。ござい。ます"]
        # segment join + validation: single 。 appended
        assert out[0]["text"] == "こんにちは。"
        # multiple 。 collapse to the LAST position (validate_punctuation)
        assert out[1]["text"].count("。") == 1
    finally:
        del sys.modules["punctuators"], sys.modules["punctuators.models"]


def test_punctuator_default_falls_back_without_package():
    from kotoba_whisper_tpu.eval.punctuator import Punctuator

    p = Punctuator.default()
    assert p.guard_content is True  # rule-based stand-in engaged


def test_regroup_gap_and_punctuation():
    """regroup: sentence-final punctuation ends a segment, >=0.5 s gaps
    split, and close small fragments merge back (stable-ts regroup(True)
    default-chain semantics on chunk units)."""
    from kotoba_whisper_tpu.eval.timestamp_repair import regroup

    chunks = [
        {"text": "こんにちは。", "timestamp": (0.0, 1.0)},   # sentence end
        {"text": "今日は",       "timestamp": (1.1, 1.6)},   # merges with next
        {"text": "いい天気",     "timestamp": (1.7, 2.4)},   # gap 0.1 -> merge
        {"text": "ですね",       "timestamp": (3.5, 4.0)},   # gap 1.1 -> split
    ]
    out = regroup(chunks)
    assert [c["text"] for c in out] == [
        "こんにちは。", "今日はいい天気", "ですね",
    ]
    assert out[1]["timestamp"] == (1.1, 2.4)


def test_regroup_tight_gaps_stay_one_segment():
    from kotoba_whisper_tpu.eval.timestamp_repair import regroup

    # tight non-sentence fragments group into a single segment (the
    # reference's regroup starts from ONE segment of word-units,
    # stable_timestamp.py:55-58, and only punctuation/gaps split it)
    chunks = [
        {"text": f"x{i}", "timestamp": (i * 0.2, i * 0.2 + 0.1)}
        for i in range(4)
    ]
    out = regroup(chunks)
    assert len(out) == 1 and out[0]["text"] == "x0x1x2x3"
    assert out[0]["timestamp"] == (0.0, pytest.approx(0.7))

    # a permissive merge window CAN rejoin gap-split non-sentence segments
    wide = [
        {"text": "a", "timestamp": (0.0, 0.1)},
        {"text": "b", "timestamp": (0.7, 0.8)},
    ]
    assert len(regroup(wide)) == 2
    assert len(regroup(wide, gap_merge=0.8)) == 1


def test_fix_timestamps_runs_regroup():
    from kotoba_whisper_tpu.eval.timestamp_repair import fix_timestamps

    chunks = [
        {"text": "a。", "timestamp": (0.0, 1.0)},
        {"text": "b", "timestamp": (None, None)},
    ]
    out = fix_timestamps(chunks, audio_duration_s=4.0)
    assert all(
        c["timestamp"][0] is not None and c["timestamp"][1] is not None
        for c in out
    )
    assert out[0]["text"] == "a。"


def test_punctuator_default_prefers_onnx_when_importable():
    """Punctuator.default() matches the reference default
    (misc/whisper_add_on/punctuator.py:10-11): the real pcs_47lang ONNX
    model whenever the package imports, rules only as a fallback."""
    import sys
    import types

    from kotoba_whisper_tpu.eval.punctuator import Punctuator

    class FakeModel:
        @classmethod
        def from_pretrained(cls, name):
            assert name == "pcs_47lang"
            return cls()

        def infer(self, texts):
            return [[t + "。"] for t in texts]

    models_mod = types.ModuleType("punctuators.models")
    models_mod.PunctCapSegModelONNX = FakeModel
    pkg = types.ModuleType("punctuators")
    pkg.models = models_mod
    sys.modules["punctuators"] = pkg
    sys.modules["punctuators.models"] = models_mod
    try:
        p = Punctuator.default()
        # the ONNX path was taken: no content guard, model drives text
        assert p.guard_content is False
        out = p.punctuate([{"text": "やあ", "timestamp": (0.0, 1.0)}])
        assert out[0]["text"] == "やあ。"
    finally:
        del sys.modules["punctuators"], sys.modules["punctuators.models"]


def _stub_reazonspeech(calls):
    """Install a fake `reazonspeech.nemo.asr` package; returns the module
    objects for cleanup."""
    import sys
    import types

    asr = types.ModuleType("reazonspeech.nemo.asr")

    class AudioData:
        def __init__(self, waveform, samplerate):
            self.waveform = waveform
            self.samplerate = samplerate

    interface = types.SimpleNamespace(AudioData=AudioData)

    def load_model():
        calls["loaded"] = calls.get("loaded", 0) + 1
        return "MODEL"

    class _Result:
        def __init__(self, text):
            self.text = text

    def transcribe(model, audio_data):
        assert model == "MODEL"
        calls.setdefault("audio", []).append(
            (len(audio_data.waveform), audio_data.samplerate)
        )
        return _Result(f"nemo transcript {len(calls['audio'])}")

    asr.interface = interface
    asr.load_model = load_model
    asr.transcribe = transcribe
    nemo = types.ModuleType("reazonspeech.nemo")
    nemo.asr = asr
    pkg = types.ModuleType("reazonspeech")
    pkg.nemo = nemo
    names = ["reazonspeech", "reazonspeech.nemo", "reazonspeech.nemo.asr"]
    for n, m in zip(names, [pkg, nemo, asr]):
        sys.modules[n] = m
    return names


def test_nemo_baseline_adapter():
    """make_nemo_transcribe_fn drives the reazonspeech package with the
    reference's call shape (run_short_form_eval.py:171-182): load_model
    once, AudioData(waveform, samplerate) per utterance, `.text` result.
    Stubbed — the NeMo stack is not installable here; the adapter
    semantics are what this pins."""
    import sys

    import numpy as np

    from kotoba_whisper_tpu.eval.nemo_baseline import (
        is_nemo_model,
        make_nemo_transcribe_fn,
    )

    assert is_nemo_model("reazon-research/reazonspeech-nemo-v2")
    assert not is_nemo_model("preset:test-byte")

    calls = {}
    names = _stub_reazonspeech(calls)
    try:
        fn = make_nemo_transcribe_fn()
        out = fn(np.zeros(1600, np.float32))
        assert out == "nemo transcript 1"
        assert calls["loaded"] == 1
        assert calls["audio"] == [(1600, 16000)]
    finally:
        for n in names:
            del sys.modules[n]


def test_nemo_baseline_guards():
    """The reference's exact guards (run_short_form_eval.py:172): the
    baseline is ja-transcribe only, checked BEFORE the optional import."""
    import pytest as _pytest

    from kotoba_whisper_tpu.eval.nemo_baseline import make_nemo_transcribe_fn

    with _pytest.raises(ValueError):
        make_nemo_transcribe_fn(task="translate")
    with _pytest.raises(ValueError):
        make_nemo_transcribe_fn(language="en")
    # with valid args but no package installed: ImportError with guidance
    with _pytest.raises(ImportError):
        make_nemo_transcribe_fn()


def test_speed_eval_reference_schema(tmp_path):
    """runtime_pipeline.jsonl rows carry the reference's exact field
    names (run_speed_eval.py:80: "time (mean)"/"time (std)"/"time (all)"
    + device) alongside this framework's short keys."""
    import json

    from kotoba_whisper_tpu.eval.speed import evaluate_speed

    out = tmp_path / "runtime_pipeline.jsonl"
    recs = evaluate_speed(
        lambda audio: "x",
        model_name="m",
        durations=[1.0],
        n_trials=2,
        n_warmup=0,
        output_path=str(out),
        attn_impl="xla",
        extra={"max_length": 32},
    )
    row = json.loads(out.read_text().splitlines()[-1])
    assert row["model"] == "m" and row["duration"] == 1.0
    assert row["time (mean)"] == row["mean"]
    assert len(row["time (all)"]) == 2
    assert row["max_length"] == 32 and "device" in row
    assert recs[0]["trials"] == 2


def test_runtime_pivot_table():
    """model x duration markdown pivot over runtime rows — the speed
    harness's pretty-table (run_speed_eval.py:34-50)."""
    from kotoba_whisper_tpu.eval.report import runtime_pivot_table

    rows = [
        {"model": "a", "duration": 10, "time (mean)": 0.5},
        {"model": "a", "duration": 300, "time (mean)": 1.25},
        {"model": "b", "duration": 10, "mean": 0.25},
    ]
    t = runtime_pivot_table(rows)
    lines = t.splitlines()
    assert lines[0] == "| model | 10 s | 300 s |"
    assert "| a | 0.500 | 1.250 |" in t
    assert "| b | 0.250 | - |" in t


def test_runtime_pivot_table_config_rows(capsys):
    """bf16 and int8-serving rows under the same model name get distinct
    rows instead of last-wins overwrites (ADVICE r4); true duplicates
    warn on stderr."""
    from kotoba_whisper_tpu.eval.report import runtime_pivot_table

    rows = [
        {"model": "m", "duration": 10, "time (mean)": 0.5,
         "gemm_dtype": "compute", "kv_dtype": "compute"},
        {"model": "m", "duration": 10, "time (mean)": 0.4,
         "gemm_dtype": "int8", "kv_dtype": "int8"},
        {"model": "m", "duration": 10, "time (mean)": 0.45,
         "gemm_dtype": "int8", "kv_dtype": "int8"},  # true duplicate
    ]
    t = runtime_pivot_table(rows)
    assert "| m | 0.500 |" in t
    assert "| m [gemm=int8, kv=int8] | 0.450 |" in t
    assert "duplicate cell" in capsys.readouterr().err
