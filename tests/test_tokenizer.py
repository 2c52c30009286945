"""Tokenizer tests: C++ BPE core vs HF's pure-python GPT2 BPE (golden),
special-token layout, round-trips, and timestamp utilities.

The golden test builds a synthetic vocab/merges pair on disk and compares
against `transformers.GPT2Tokenizer` loaded from the same files — byte-level
BPE semantics are identical between GPT-2 and Whisper (SURVEY.md §2.4).
"""
import json

import numpy as np
import pytest

from kotoba_whisper_tpu.core.config import SpecialTokens
from kotoba_whisper_tpu.tokenizer.whisper_tokenizer import (
    WhisperTokenizer,
    bytes_to_unicode,
    segments_from_tokens,
)


@pytest.fixture(scope="module")
def synth_vocab(tmp_path_factory):
    """Byte alphabet + a handful of real merges, GPT-2 file format."""
    d = tmp_path_factory.mktemp("vocab")
    b2u = bytes_to_unicode()
    alphabet = [b2u[i] for i in range(256)]
    merge_pairs = [
        ("t", "h"),
        ("th", "e"),
        ("Ġ", "t"),
        ("Ġt", "he"),
        ("i", "n"),
        ("Ġ", "a"),
        ("e", "r"),
        ("o", "n"),
        ("Ġthe", "Ġthe"),  # never fires, exercises rank order
        ("h", "e"),
    ]
    vocab = {ch: i for i, ch in enumerate(alphabet)}
    for a, b in merge_pairs:
        if a in vocab and b in vocab and a + b not in vocab:
            vocab[a + b] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    lines = ["#version: 0.2"] + [f"{a} {b}" for a, b in merge_pairs]
    (d / "merges.txt").write_text("\n".join(lines) + "\n", encoding="utf-8")
    return d


def test_bpe_matches_gpt2_reference(synth_vocab):
    trf = pytest.importorskip("transformers")
    hf = trf.GPT2Tokenizer(
        str(synth_vocab / "vocab.json"), str(synth_vocab / "merges.txt")
    )
    tok = WhisperTokenizer.from_files(
        str(synth_vocab / "vocab.json"), str(synth_vocab / "merges.txt")
    )
    texts = [
        "the theatre is there",
        " on the other hand",
        "hello world",
        "こんにちは世界、テスト。",
        "mixed 日本語 and English 123 !?",
        "   spaces\tand\nnewlines ",
        "don't can't we'll",
    ]
    for t in texts:
        assert tok.encode(t) == hf.encode(t), t
        assert tok.decode(tok.encode(t)) == t


def test_byte_vocab_roundtrip():
    tok = WhisperTokenizer.byte_vocab()
    for t in ["hello", "日本語のテキスト", "a b c!"]:
        ids = tok.encode(t)
        assert tok.decode(ids) == t
        assert all(0 <= i < 256 for i in ids)


def test_special_layout_v2_v3():
    st2 = SpecialTokens.for_vocab(51865)
    assert (st2.eot, st2.sot) == (50257, 50258)
    assert st2.n_langs == 99
    assert st2.translate == 50358
    assert st2.transcribe == 50359
    assert st2.startofprev == 50361
    assert st2.no_timestamps == 50363
    assert st2.timestamp_begin == 50364
    st3 = SpecialTokens.for_vocab(51866)
    assert st3.n_langs == 100
    assert st3.transcribe == 50360
    assert st3.timestamp_begin == 50365
    assert st3.timestamp_begin + 1500 == 51865  # <|30.00|>


def test_sot_sequence_and_specials():
    tok = WhisperTokenizer.byte_vocab(51865)
    st = tok.special
    assert tok.sot_sequence("ja", "transcribe") == [st.sot, tok.lang_id("ja"), st.transcribe]
    assert tok.sot_sequence("en", "translate", timestamps=False) == [
        st.sot, tok.lang_id("en"), st.translate, st.no_timestamps,
    ]
    assert len(tok.timestamp_ids()) == 1501
    # specials embedded in text
    ids = tok.encode("<|startoftranscript|><|ja|><|transcribe|><|0.00|>hi")
    assert ids[:4] == [st.sot, tok.lang_id("ja"), st.transcribe, st.timestamp_begin]
    assert tok.decode(ids) == "hi"
    assert (
        tok.decode(ids, skip_special_tokens=False, decode_with_timestamps=True)
        == "<|startoftranscript|><|ja|><|transcribe|><|0.00|>hi"
    )


def test_prompt_ids_and_strip_timestamps():
    tok = WhisperTokenizer.byte_vocab(51865)
    st = tok.special
    p = tok.prompt_ids("previous context")
    assert p[0] == st.startofprev
    assert tok.decode(p) == " previous context"
    ids = [st.timestamp_begin, 72, 105, st.timestamp_begin + 50, st.eot]
    assert tok.strip_timestamps(ids) == [72, 105, st.eot]


def test_segments_from_tokens():
    tok = WhisperTokenizer.byte_vocab(51865)
    st = tok.special
    ids = (
        [st.timestamp_begin]
        + tok.encode("hi")
        + [st.timestamp_begin + 100, st.timestamp_begin + 100]
        + tok.encode(" yo")
        + [st.timestamp_begin + 150, st.eot]
    )
    segs = segments_from_tokens(tok, ids)
    assert segs == [
        {"start": 0.0, "end": 2.0, "text": "hi"},
        {"start": 2.0, "end": 3.0, "text": " yo"},
    ]
