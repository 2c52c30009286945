"""Unigram tokenizer goldens vs the `tokenizers` library (offline oracle).

Synthetic Unigram vocabularies are serialized through the real tokenizers
Rust implementation and our Viterbi engine must match its ids exactly —
the NLLB tokenizer path of the cascaded S2T translation family.
"""
from __future__ import annotations

import json

import numpy as np
import pytest

from kotoba_whisper_tpu.tokenizer.unigram import NllbTokenizer, UnigramTokenizer

tokenizers = pytest.importorskip("tokenizers")


def _build_oracle(vocab, tmp_path, added=()):
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers
    from tokenizers import AddedToken

    tok = Tokenizer(models.Unigram(vocab, unk_id=0))
    tok.normalizer = normalizers.NFKC()
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always"
    )
    if added:
        tok.add_special_tokens([AddedToken(a, special=True) for a in added])
    path = str(tmp_path / "tokenizer.json")
    tok.save(path)
    return tok, path


VOCAB = [
    ("<unk>", 0.0), ("</s>", 0.0),
    ("▁", -6.0), ("▁the", -3.0), ("▁quick", -5.0), ("▁q", -4.5),
    ("uick", -4.8), ("▁brown", -5.1), ("▁fox", -4.9), ("▁jumps", -5.3),
    ("s", -3.9), ("▁jump", -4.7), ("th", -4.0), ("e", -3.5), ("▁th", -3.8),
    ("▁over", -4.4), ("▁lazy", -5.2), ("▁dog", -4.6), ("o", -3.7),
    ("ver", -4.2), ("▁o", -4.1), ("g", -4.0), ("▁do", -4.3), ("qu", -4.4),
    ("ick", -4.2), ("▁bro", -4.9), ("wn", -4.1), ("fox", -5.5), ("▁f", -4.2),
    ("ox", -4.3), ("jump", -5.0), ("▁j", -4.4), ("umps", -4.6), ("la", -4.3),
    ("zy", -4.4), ("▁l", -4.2), ("azy", -4.5), ("d", -4.1), ("▁d", -4.2),
    ("og", -4.3),
]

SENTENCES = [
    "the quick brown fox jumps over the lazy dog",
    "the the the",
    "fox",
    "quick jumps  dog",          # double space
    "ｔｈｅ fox",                  # fullwidth -> NFKC -> ascii
    " fox",                      # leading space absorbed by prepend
    "fox ",                      # trailing space -> bare marker token
    "  fox",                     # double leading space
]


def test_viterbi_matches_tokenizers_oracle(tmp_path):
    oracle, path = _build_oracle(VOCAB, tmp_path)
    ours = UnigramTokenizer.from_tokenizer_json(path)
    for s in SENTENCES:
        want = oracle.encode(s).ids
        got = ours.encode_text(s)
        assert got == want, (s, got, want, oracle.encode(s).tokens)


def test_unknown_chars_fuse(tmp_path):
    oracle, path = _build_oracle(VOCAB, tmp_path)
    ours = UnigramTokenizer.from_tokenizer_json(path)
    s = "fox #@ dog"
    want = oracle.encode(s).ids
    got = ours.encode_text(s)
    assert got == want, (got, want, oracle.encode(s).tokens)


def test_nllb_framing_and_decode(tmp_path):
    _, path = _build_oracle(
        VOCAB, tmp_path, added=["jpn_Jpan", "eng_Latn"]
    )
    tok = NllbTokenizer.from_pretrained_dir(str(tmp_path))
    ids = tok.encode("the quick fox", "eng_Latn")
    assert ids[0] == tok.lang_id("eng_Latn")
    assert ids[-1] == tok.eos_id
    assert tok.decode(ids) == "the quick fox"


def test_roundtrip_decode(tmp_path):
    _, path = _build_oracle(VOCAB, tmp_path)
    ours = UnigramTokenizer.from_tokenizer_json(path)
    s = "the lazy dog jumps"
    assert ours.decode_ids(ours.encode_text(s)) == s


def test_precompiled_normalizer_from_tokenizer_json(tmp_path):
    """A tokenizer.json carrying a Sequence[Precompiled, Replace]
    normalizer (the NLLB shape: NMT-NFKC charsmap + space collapsing)
    must drive OUR charsmap decoder and match the tokenizers oracle's
    ids exactly — closing the NFKC-approximation gap (ADVICE r2 #1)."""
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers

    from kotoba_whisper_tpu.tokenizer.charsmap import build_charsmap

    blob = build_charsmap({
        "Ｔ": "t", "Ｑ": "q", "１": "1", "…": "...", "​": "",
    })
    tok = Tokenizer(models.Unigram(VOCAB, unk_id=0))
    tok.normalizer = normalizers.Sequence([
        normalizers.Precompiled(blob),
        normalizers.Replace(tokenizers.Regex(" {2,}"), " "),
    ])
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always"
    )
    path = str(tmp_path / "tokenizer.json")
    tok.save(path)

    ours = UnigramTokenizer.from_tokenizer_json(path)
    cases = [
        "Ｔhe Ｑuick fox",      # charsmap-mapped fullwidth letters
        "the​quick",            # zero-width space removed
        "jumps  over   dog",    # Replace collapses runs of spaces
        "…the dog１",
        "plain the quick",
    ]
    for text in cases:
        assert ours.encode_text(text) == tok.encode(text).ids, text
