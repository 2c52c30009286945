"""Precompiled charsmap decoder vs the REAL consumer implementation.

build_charsmap constructs valid sentencepiece Precompiled blobs (darts-
clone trie + pool); both our decoder and HF `tokenizers.normalizers.
Precompiled` (the Rust spm_precompiled crate that loads NLLB's actual
tokenizer.json blob) must agree on every normalization — validating the
trie traversal, pool decoding, chunking, and full-chunk-match semantics
against the implementation our unigram engine targets for parity.
"""
import pytest

tokenizers = pytest.importorskip("tokenizers")

from kotoba_whisper_tpu.tokenizer.charsmap import (  # noqa: E402
    PrecompiledCharsmap,
    build_charsmap,
)

# NMT-NFKC-style mappings: fullwidth compat, voiced kana (multi-char via
# combining mark), control removal, multi-byte sources
MAPPING = {
    "Ａ": "A",
    "Ｂ": "B",
    "１": "1",
    "ｶ": "カ",
    "が": "が",   # KA + combining voiced mark -> GA
    "ﬁ": "fi",
    "​": "",       # zero-width space removed
    "…": "...",
    " ": " ",           # NBSP -> space
}


@pytest.fixture(scope="module")
def blob():
    return build_charsmap(MAPPING)


@pytest.fixture(scope="module")
def oracle(blob):
    return tokenizers.normalizers.Precompiled(blob)


@pytest.fixture(scope="module")
def ours(blob):
    return PrecompiledCharsmap(blob)


CASES = [
    "Ａ",
    "ＡＢ plain ＡＢ",
    "１２",                  # only １ mapped; ２ passes through
    "ｶﾞ is not mapped whole",  # halfwidth + halfwidth mark: per-char path
    "がき",            # mapped combining pair + unmapped char
    "ﬁnancial ﬁle",
    "a​b",
    "ellipsis… here",
    "nb sp",                # NBSP between words
    "mixed Ａが１…​ end",
    "",
    "plain ascii only",
]


@pytest.mark.parametrize("text", CASES)
def test_matches_tokenizers_precompiled(ours, oracle, text):
    assert ours.normalize(text) == oracle.normalize_str(text)


def test_expected_mappings(ours):
    # ASCII-unambiguous expectations only; everything else is pinned by
    # oracle agreement (visual literals hide composed/decomposed forms)
    assert ours.normalize("a​b") == "ab"
    assert ours.normalize("…") == "..."
    assert ours.normalize("Ａ１") == "A1"


def test_fuzz_agreement(ours, oracle):
    import random

    rng = random.Random(0)
    alphabet = list("abcＡＢ１ｶﬁ…  か") + ["゙", "​", "キ"]
    for _ in range(200):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        assert ours.normalize(s) == oracle.normalize_str(s), repr(s)
