"""Parity-kit dress rehearsal (VERDICT r4 #7): drive recipes/parity_eval.sh
end-to-end with a random-weights checkpoint exported in exact HF
safetensors layout, so the real-weights day needs only checkpoints:

  export HF-layout model -> eval_short_form over a synthetic ja eval set
  -> cross-stack parity_check (ours vs torch+transformers on the SAME
  checkpoint file) -> eval_diff against a reference-schema artifact tree.
"""
import json
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _wav_bytes(audio, sr=16000):
    pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
    return (
        struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, 1,
            sr, sr * 2, 2, 16, b"data", len(pcm),
        )
        + pcm
    )


@pytest.mark.slow
def test_parity_eval_recipe_rehearsal(tmp_path):
    pytest.importorskip("torch")
    pytest.importorskip("transformers")

    from kotoba_whisper_tpu.cli import common, eval_short_form
    from kotoba_whisper_tpu.data import reazon
    from kotoba_whisper_tpu.train import checkpoint

    # --- HF-layout checkpoint from a random model (real-whisper vocab
    # layout so generation_config carries lang_to_id/task_to_id) ---
    params, cfg = common.load_model("preset:test-tiny")
    model_dir = str(tmp_path / "kotoba-whisper-rehearsal")
    checkpoint.export_hf_model(model_dir, params, cfg)
    gen_cfg = json.load(open(os.path.join(model_dir, "generation_config.json")))
    assert gen_cfg["lang_to_id"]["<|ja|>"] == 50266  # whisper layout
    assert gen_cfg["task_to_id"]["transcribe"] == 50359

    # --- synthetic ja eval set in the prepared-eval-set layout ---
    ds = tmp_path / "eval" / "ja_asr.jsut_basic5000"
    ds.mkdir(parents=True)
    rng = np.random.default_rng(99)
    utts, lines = [], []
    for i in range(3):
        t = np.arange(10000) / 16000.0
        audio = 0.2 * np.sin(2 * np.pi * (200 + 40 * i) * t)
        audio += 0.02 * rng.standard_normal(t.shape)
        utts.append((f"j/{i}.wav", _wav_bytes(audio.astype(np.float32))))
        lines.append(f"j/{i}.wav\t音声サンプル{i}です。")
    reazon.write_tar_shard(str(ds / "000.tar"), utts)
    (ds / "transcript.tsv").write_text("\n".join(lines), encoding="utf-8")
    sample_wav = tmp_path / "sample.wav"
    sample_wav.write_bytes(utts[0][1])

    # --- mock committed reference tree: same eval once, into REF_EVAL ---
    ref_eval = str(tmp_path / "ref_eval")
    args = [
        "--model", model_dir,
        "--tokenizer", "byte",
        "--dataset_dir", str(ds),
        "--dataset_name", "ja_asr.jsut_basic5000",
        "--language", "ja", "--task", "transcribe",
        "--dtype", "float32",
    ]
    eval_short_form.main(args + ["--output_dir", ref_eval])
    assert os.path.exists(
        os.path.join(ref_eval, "metric.ja.transcribe.jsonl")
    )

    # --- the recipe, end to end ---
    env = dict(os.environ)
    env.update(
        EVAL_DATA=str(tmp_path / "eval"),
        MODELS=model_dir,
        TOKENIZER="byte",
        OUT=str(tmp_path / "out_eval"),
        REF_EVAL=ref_eval,
        TOLERANCE="1e-6",
        PARITY_AUDIO=str(sample_wav),
        PARITY_MAX_LENGTH="12",
        PARITY_STRICT="0",   # random weights may tie-break argmax
        KWT_PLATFORM="cpu",
        PYTHONPATH=REPO + ":" + env.get("PYTHONPATH", ""),
    )
    r = subprocess.run(
        ["bash", os.path.join(REPO, "recipes", "parity_eval.sh")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-3000:]

    # parity_check ran and reported every stage
    for stage in ("[mel]", "[encoder]", "[logits]", "[greedy]"):
        assert stage in r.stdout, r.stdout[-2000:]
    # mel parity must be tight even on random weights
    mel_line = [l for l in r.stdout.splitlines() if l.startswith("[mel]")][0]
    assert float(mel_line.split("=")[1]) < 1e-3, mel_line

    # eval artifacts exist in the reference schema and diff clean
    out_eval = str(tmp_path / "out_eval")
    names = os.listdir(out_eval)
    assert "metric.ja.transcribe.jsonl" in names
    assert any(n.startswith("model-") and n.endswith(".csv") for n in names)
    rec = json.loads(
        open(os.path.join(out_eval, "metric.ja.transcribe.jsonl"))
        .read().splitlines()[-1]
    )
    for key in ("model", "dataset", "cer_raw", "cer_norm", "wer_raw",
                "wer_norm"):
        assert key in rec, rec
