"""End-to-end CLI pipeline test: all five stage drivers chained on a
synthetic ReazonSpeech-style dataset, mirroring the reference's
orchestrated recipe (script/distil_whisper_v2.0.sh flow, SURVEY.md §3.5)."""
import json
import os
import struct

import numpy as np
import pytest

from kotoba_whisper_tpu.data import reazon


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


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("reazon")
    utts = [
        (f"000/utt{i}.wav", _wav_bytes(rng.standard_normal(8000) * 0.1))
        for i in range(6)
    ]
    reazon.write_tar_shard(str(d / "000.tar"), utts)
    (d / "transcript.tsv").write_text(
        "\n".join(f"000/utt{i}.wav\tutterance number {i}" for i in range(6)),
        encoding="utf-8",
    )
    return str(d)


@pytest.mark.slow
def test_full_pipeline(dataset_dir, tmp_path):
    from kotoba_whisper_tpu.cli import (
        create_student,
        data_filter,
        distill,
        eval_short_form,
        eval_speed,
        pseudo_label,
    )

    out = str(tmp_path)

    # stage 2: pseudo-label
    pseudo_label.main([
        "--dataset_dir", dataset_dir,
        "--output_dir", f"{out}/labels",
        "--model", "preset:test-byte",
        "--tokenizer", "byte",
        "--batch_size", "3",
        "--max_label_length", "24",
        "--dtype", "float32",
    ])
    rows = [json.loads(l) for l in open(f"{out}/labels/pseudo_labels.jsonl")]
    assert len(rows) == 6
    assert all(isinstance(r["whisper_transcript"], list) for r in rows)
    assert os.path.exists(f"{out}/labels/pseudo_labels.csv")

    # stage 3: filter (skip WER filtering — random model labels all fail it;
    # exercise length filters + label prep + logmel vectorize)
    data_filter.main([
        "--dataset_dir", dataset_dir,
        "--labels", f"{out}/labels/pseudo_labels.jsonl",
        "--output_dir", f"{out}/filtered",
        "--tokenizer", "byte",
        "--skip_filtering",
        "--max_label_length", "32",
        "--batch_size", "3",
    ])
    filt = [json.loads(l) for l in open(f"{out}/filtered/filtered.jsonl")]
    assert len(filt) == 6
    feats = np.load(f"{out}/filtered/features.npz")["input_features"]
    assert feats.shape == (6, 80, 3000)

    # also verify the WER-filter path drops everything for random labels
    data_filter.main([
        "--dataset_dir", dataset_dir,
        "--labels", f"{out}/labels/pseudo_labels.jsonl",
        "--output_dir", f"{out}/filtered_strict",
        "--tokenizer", "byte",
        "--wer_threshold", "10",
        "--skip_logmel",
    ])
    strict = [json.loads(l) for l in open(f"{out}/filtered_strict/filtered.jsonl")]
    assert len(strict) == 0

    # stage 4: student init
    create_student.main([
        "--teacher", "preset:test-byte",
        "--save_dir", f"{out}/student_init",
        "--decoder_layers", "1",
    ])
    cfg = json.load(open(f"{out}/student_init/config.json"))
    assert cfg["decoder_layers"] == 1

    # stage 5: distillation (3 steps)
    distill.main([
        "--data_dir", f"{out}/filtered",
        "--student", f"{out}/student_init",
        "--teacher", "preset:test-byte",
        "--output_dir", f"{out}/distilled",
        "--tokenizer", "byte",
        "--per_device_train_batch_size", "2",
        "--max_steps", "3",
        "--max_label_length", "32",
        "--warmup_steps", "1",
        "--logging_steps", "1",
        "--save_steps", "100",
        "--dtype", "float32",
        "--mesh_model_axis", "1",
        "--num_devices", "2",
        "--num_train_epochs", "4",
    ])
    assert os.path.exists(f"{out}/distilled/final/config.json")
    metric_files = [f for f in os.listdir(f"{out}/distilled") if f.startswith("metrics")]
    assert metric_files

    # resume path: second invocation restores from the saved checkpoint
    distill.main([
        "--data_dir", f"{out}/filtered",
        "--student", f"{out}/student_init",
        "--teacher", "preset:test-byte",
        "--output_dir", f"{out}/distilled",
        "--tokenizer", "byte",
        "--per_device_train_batch_size", "2",
        "--max_steps", "4",
        "--max_label_length", "32",
        "--warmup_steps", "1",
        "--logging_steps", "1",
        "--save_steps", "100",
        "--dtype", "float32",
        "--num_devices", "2",
        "--num_train_epochs", "4",
    ])

    # stage 6: short-form eval on the distilled model
    eval_short_form.main([
        "--model", f"{out}/distilled/final",
        "--tokenizer", "byte",
        "--dataset_dir", dataset_dir,
        "--dataset_name", "synthetic_test",
        "--output_dir", f"{out}/eval_pipeline",
        "--dtype", "float32",
        "--limit", "2",
    ])
    metric_path = f"{out}/eval_pipeline/metric.ja.transcribe.jsonl"
    rec = json.loads(open(metric_path).read().splitlines()[-1])
    assert {"cer_raw", "wer_raw", "cer_norm", "wer_norm"} <= set(rec)
    # prediction cache exists and is resumable (second run hits the cache)
    caches = [
        f for f in os.listdir(f"{out}/eval_pipeline") if f.startswith("prediction.")
    ]
    assert len(caches) == 1

    # speed eval (1 duration, 1 trial to keep it quick)
    eval_speed.main([
        "--model", f"{out}/distilled/final",
        "--tokenizer", "byte",
        "--durations", "2",
        "--n_trials", "1",
        "--output", f"{out}/eval_pipeline/runtime_pipeline.jsonl",
        "--dtype", "float32",
        "--attn", "xla",
    ])
    speed_rec = json.loads(
        open(f"{out}/eval_pipeline/runtime_pipeline.jsonl").read().splitlines()[-1]
    )
    assert speed_rec["duration"] == 2.0 and speed_rec["mean"] > 0


@pytest.mark.slow
def test_bilingual_pipeline(dataset_dir, tmp_path):
    """v3 flow: dual-task pseudo-label -> multi-column filter -> bilingual
    multitask distillation (run_*_v3.py counterparts)."""
    from kotoba_whisper_tpu.cli import (
        create_student,
        data_filter,
        distill_bilingual,
        pseudo_label,
    )

    out = str(tmp_path)
    pseudo_label.main([
        "--dataset_dir", dataset_dir,
        "--output_dir", f"{out}/labels",
        "--model", "preset:test-byte",
        "--tokenizer", "byte",
        "--batch_size", "3",
        "--max_label_length", "20",
        "--dtype", "float32",
        "--text_lang_task", "ja:transcribe,en:translate",
    ])
    rows = [json.loads(l) for l in open(f"{out}/labels/pseudo_labels.jsonl")]
    assert "whisper_transcript/transcribe.ja" in rows[0]
    assert "whisper_transcript/translate.en" in rows[0]

    data_filter.main([
        "--dataset_dir", dataset_dir,
        "--labels", f"{out}/labels/pseudo_labels.jsonl",
        "--output_dir", f"{out}/filtered",
        "--tokenizer", "byte",
        "--skip_filtering",
        "--max_label_length", "32",
        "--label_column",
        "whisper_transcript/transcribe.ja,whisper_transcript/translate.en",
    ])
    filt = [json.loads(l) for l in open(f"{out}/filtered/filtered.jsonl")]
    assert len(filt) == 6
    assert "labels/transcribe.ja" in filt[0] and "labels/translate.en" in filt[0]

    create_student.main([
        "--teacher", "preset:test-byte",
        "--save_dir", f"{out}/student",
        "--decoder_layers", "1",
    ])
    # the ja spec uses a comma-joined dir GROUP (the recipe's randomized
    # 5-subset group) — rows/features from each part are concatenated
    distill_bilingual.main([
        "--dataset",
        f"ja:{out}/filtered,{out}/filtered:transcribe.ja+translate.en:kl",
        "--student", f"{out}/student",
        "--teacher", "preset:test-byte",
        "--output_dir", f"{out}/bilingual",
        "--tokenizer", "byte",
        "--per_dataset_batch_size", "2",
        "--max_steps", "2",
        "--max_label_length", "32",
        "--warmup_steps", "1",
        "--logging_steps", "1",
        "--dtype", "float32",
    ])
    assert os.path.exists(f"{out}/bilingual/final/config.json")
    metrics = [
        json.loads(l)
        for l in open(f"{out}/bilingual/metrics.bilingual.jsonl")
    ]
    keys = set(metrics[-1])
    assert "train/ce_loss.transcribe.ja" in keys
    assert "train/ce_loss.translate.en" in keys
    assert "train/kl_loss.transcribe.ja" in keys


@pytest.mark.slow
def test_pseudo_label_dp_and_streaming_match(dataset_dir, tmp_path):
    """In-driver data-parallel decode (mesh-sharded batch, the reference's
    run_pseudo_labelling.py:330-341 DP loop) and continuous-batching
    streaming decode both produce token-identical pseudo-labels to the
    single-device lockstep driver."""
    import json as _json

    from kotoba_whisper_tpu.cli import pseudo_label

    def run(out, extra):
        pseudo_label.main([
            "--dataset_dir", dataset_dir,
            "--output_dir", out,
            "--model", "preset:test-byte",
            "--tokenizer", "byte",
            "--batch_size", "2",
            "--max_label_length", "20",
            "--dtype", "float32",
        ] + extra)
        rows = [_json.loads(l) for l in open(f"{out}/pseudo_labels.jsonl")]
        return {r["name"]: r["whisper_transcript"] for r in rows}

    base = run(f"{tmp_path}/base", [])
    dp = run(f"{tmp_path}/dp", ["--num_devices", "2"])
    stream = run(f"{tmp_path}/stream", ["--streaming"])
    assert base == dp
    assert base == stream
    # w8a8 quantized decode: outputs may legitimately differ from fp32 on a
    # random model, but the driver path (quantize transform -> generate ->
    # jsonl) must produce a label for every utterance
    q = run(f"{tmp_path}/int8", ["--gemm_dtype", "int8"])
    assert set(q) == set(base)
    # w8a8 composes with continuous batching (the fused refill scan
    # projects cross-KV through the quantized dense path)
    qs = run(f"{tmp_path}/int8stream", ["--gemm_dtype", "int8", "--streaming"])
    assert qs == q
    # beam pseudo-labelling through the streaming (beam-group) path
    beam = run(f"{tmp_path}/beam", ["--num_beams", "2"])
    beam_stream = run(
        f"{tmp_path}/beam_stream", ["--num_beams", "2", "--streaming"]
    )
    assert beam == beam_stream


@pytest.mark.slow
def test_pipeline_selective_wer_filter(dataset_dir, tmp_path):
    """Drive the filter stage through a SELECTIVE outcome: half the pseudo-
    labels match the ground truth exactly (WER 0, kept), half are garbage
    (WER >= 100, dropped) — the reference's WER-10 gate
    (run_data_filtering.py:157-177) must keep exactly the matching half."""
    import json as _json

    from kotoba_whisper_tpu.cli import data_filter
    from kotoba_whisper_tpu.tokenizer.whisper_tokenizer import WhisperTokenizer

    tok = WhisperTokenizer.byte_vocab()
    rows = []
    for i in range(6):
        text = (
            f"utterance number {i}" if i % 2 == 0 else "completely wrong words"
        )
        rows.append({
            "name": f"000/utt{i}.wav",
            "transcription": f"utterance number {i}",
            "whisper_transcript": tok.sot_sequence("ja", "transcribe")
            + tok.encode(text) + [tok.special.eot],
        })
    labels = tmp_path / "labels.jsonl"
    labels.write_text("\n".join(_json.dumps(r) for r in rows) + "\n")

    data_filter.main([
        "--dataset_dir", dataset_dir,
        "--labels", str(labels),
        "--output_dir", f"{tmp_path}/filtered",
        "--tokenizer", "byte",
        "--wer_threshold", "10",
        "--skip_logmel",
    ])
    kept = [
        _json.loads(l) for l in open(f"{tmp_path}/filtered/filtered.jsonl")
    ]
    assert [r["name"] for r in kept] == [f"000/utt{i}.wav" for i in (0, 2, 4)]


@pytest.mark.slow
def test_cascaded_mt_eval(dataset_dir, tmp_path):
    """eval_short_form --cascaded_mt: the ASR->MT translation pipeline runs
    end-to-end from an NLLB-format checkpoint dir and appends to the
    metric.{lang}.translate.jsonl schema (run_short_form_eval.py:156-170,
    227-235)."""
    import json as _json

    torch = pytest.importorskip("torch")
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import AddedToken, Tokenizer, models, normalizers
    from tokenizers import pre_tokenizers
    from transformers import M2M100Config, M2M100ForConditionalGeneration

    from kotoba_whisper_tpu.cli import eval_short_form

    ckpt = tmp_path / "nllb"
    hf_cfg = M2M100Config(
        vocab_size=64, d_model=16, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=32, decoder_ffn_dim=32, max_position_embeddings=64,
        pad_token_id=1, eos_token_id=2, bos_token_id=0,
        decoder_start_token_id=2, scale_embedding=True, dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0,
        activation_function="relu",
    )
    torch.manual_seed(0)
    M2M100ForConditionalGeneration(hf_cfg).save_pretrained(
        str(ckpt), safe_serialization=True
    )
    vocab = [("<unk>", 0.0), ("</s>", 0.0)] + [
        (p, -3.0 - 0.01 * i)
        for i, p in enumerate(["▁", "▁u", "t", "te", "r", "an", "ce", "n", "um", "b", "e"])
    ]
    tok = Tokenizer(models.Unigram(vocab, unk_id=0))
    tok.normalizer = normalizers.NFKC()
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always"
    )
    tok.add_special_tokens(
        [AddedToken("jpn_Jpan", special=True), AddedToken("eng_Latn", special=True)]
    )
    tok.save(str(ckpt / "tokenizer.json"))

    out = tmp_path / "eval_mt"
    eval_short_form.main([
        "--model", "preset:test-byte",
        "--tokenizer", "byte",
        "--dataset_dir", dataset_dir,
        "--dataset_name", "synthetic_mt",
        "--output_dir", str(out),
        "--dtype", "float32",
        "--limit", "2",
        "--cascaded_mt", str(ckpt),
    ])
    rec = _json.loads(
        open(out / "metric.ja.translate.jsonl").read().splitlines()[-1]
    )
    assert {"cer_raw", "wer_raw", "cer_norm", "wer_norm"} <= set(rec)


def test_nemo_baseline_eval(dataset_dir, tmp_path):
    """eval_short_form --model reazon-research/reazonspeech-nemo-v2: the
    baseline-zoo branch (run_short_form_eval.py:171-182) runs the stubbed
    NeMo adapter end-to-end — no whisper model is loaded — and writes the
    standard metric.ja.transcribe.jsonl + prediction CSV artifacts."""
    import json as _json
    import sys

    from kotoba_whisper_tpu.cli import eval_short_form
    from tests.test_report_addons import _stub_reazonspeech

    calls = {}
    names = _stub_reazonspeech(calls)
    out = tmp_path / "eval_nemo"
    try:
        eval_short_form.main([
            "--model", "reazon-research/reazonspeech-nemo-v2",
            "--dataset_dir", dataset_dir,
            "--dataset_name", "synthetic",
            "--output_dir", str(out),
            "--limit", "2",
        ])
    finally:
        for n in names:
            del sys.modules[n]
    assert calls["loaded"] == 1
    assert len(calls["audio"]) == 2
    rec = _json.loads(
        open(out / "metric.ja.transcribe.jsonl").read().splitlines()[-1]
    )
    assert rec["model"] == "reazon-research/reazonspeech-nemo-v2"
    assert {"cer_raw", "wer_raw", "cer_norm", "wer_norm"} <= set(rec)


@pytest.mark.slow
def test_pseudo_label_int16_wire(dataset_dir, tmp_path):
    """--wire_dtype int16 runs end to end; for WAV(PCM)-sourced audio
    resampling is a no-op here (source is 16 kHz), so labels match the
    fp32 wire exactly."""
    import json

    from kotoba_whisper_tpu.cli import pseudo_label

    out = str(tmp_path)
    base = [
        "--dataset_dir", dataset_dir,
        "--model", "preset:test-byte",
        "--tokenizer", "byte",
        "--batch_size", "3",
        "--max_label_length", "24",
        "--dtype", "float32",
    ]
    pseudo_label.main(base + ["--output_dir", f"{out}/f32"])
    pseudo_label.main(
        base + ["--output_dir", f"{out}/i16", "--wire_dtype", "int16"]
    )
    ref = {r["name"]: r["whisper_transcript"] for r in map(
        json.loads, open(f"{out}/f32/pseudo_labels.jsonl"))}
    got = {r["name"]: r["whisper_transcript"] for r in map(
        json.loads, open(f"{out}/i16/pseudo_labels.jsonl"))}
    assert got == ref
