"""English number normalizer: golden comparison against the HF
implementation on a curated corpus of ASR-typical constructs."""
import pytest

from kotoba_whisper_tpu.eval.number_normalizer import EnglishNumberNormalizer

CASES = [
    "one",
    "twelve",
    "twenty",
    "twenty one",
    "twenty-three",
    "one hundred",
    "one hundred and twenty three",
    "two hundred fifty six",
    "three thousand",
    "twelve thousand five hundred",
    "four million",
    "seven billion people",
    "three point one four",
    "zero point five",
    "ten percent",
    "fifty percent of the time",
    "twenty dollars",
    "fifty cents",
    "first",
    "second place",
    "the twentieth century",
    "twenty-first",
    "he was born in nineteen eighty four",
    "the year two thousand",
    "i have two apples and three oranges",
    "no numbers here at all",
    "123 already digits",
    "it costs five dollars",
    "sixties",
    "the nineteen sixties",
    "forty two",
    "ninety nine",
    "a thousand and one nights",
    "seven hundred and seventy seven",
    "oh seven",
    "double oh seven",
    "minus five degrees",
    "negative ten",
    "nineteen eighty four",
    "one two three",
    "point five",
    "one point five",
    "a hundred and one",
    "ones",
]


def test_full_english_normalizer_matches_hf():
    """End-to-end EnglishTextNormalizer (with numbers) vs HF on sentences."""
    trf = pytest.importorskip("transformers")
    from transformers.models.whisper.english_normalizer import (
        EnglishTextNormalizer as HFText,
    )

    from kotoba_whisper_tpu.eval.normalizers import EnglishTextNormalizer

    ours = EnglishTextNormalizer()
    hf = HFText({})
    sentences = [
        "He won't pay twenty dollars for the ticket!",
        "She was born in nineteen eighty four.",
        "Mr. Smith bought one hundred and twenty three apples",
        "I'd say it's fifty percent done",
        "The temperature dropped to minus five degrees",
        "They're selling it for three point one four",
        "It happened in the nineteen sixties",
        "The twenty-first century began",
    ]
    mismatches = []
    for s_ in sentences:
        a, b = ours(s_), hf(s_)
        if a != b:
            mismatches.append((s_, a, b))
    assert not mismatches, mismatches


@pytest.fixture(scope="module")
def hf_norm():
    trf = pytest.importorskip("transformers")
    from transformers.models.whisper.english_normalizer import (
        EnglishNumberNormalizer as HF,
    )

    return HF()


def test_matches_hf_on_curated_corpus(hf_norm):
    ours = EnglishNumberNormalizer()
    mismatches = []
    for case in CASES:
        got = ours(case)
        want = hf_norm(case)
        if got != want:
            mismatches.append((case, got, want))
    assert not mismatches, mismatches


def test_standalone_sanity():
    n = EnglishNumberNormalizer()
    assert n("double oh seven") == "007"
    assert n("one hundred") == "100"
    assert n("plain words stay put") == "plain words stay put"


def test_fuzz_agreement_with_hf(hf_norm):
    """Grammar-fuzzed phrases: high agreement with HF. Divergences are
    confined to malformed run-on juxtapositions ("two point three six eight
    point seven eight") where the reference's own output is degenerate;
    well-formed numbers must match exactly (curated corpus above)."""
    import random

    from kotoba_whisper_tpu.eval.number_normalizer import (
        EnglishNumberNormalizer,
    )

    mine = EnglishNumberNormalizer()
    rng = random.Random(0)
    ones = "one two three four five six seven eight nine".split()
    teens = ("ten eleven twelve thirteen fourteen fifteen sixteen "
             "seventeen eighteen nineteen").split()
    tens = "twenty thirty forty fifty sixty seventy eighty ninety".split()
    fill = "the a cat runs quickly and then some".split()

    def gen_number():
        kind = rng.randrange(6)
        if kind == 0:
            return f"{rng.choice(tens)} {rng.choice(ones)}"
        if kind == 1:
            return (f"{rng.choice(ones)} hundred and {rng.choice(tens)} "
                    f"{rng.choice(ones)}")
        if kind == 2:
            return f"{rng.choice(teens)} {rng.choice(tens)}"
        if kind == 3:
            return f"{rng.choice(ones)} thousand {rng.choice(ones)} hundred"
        if kind == 4:
            return f"{rng.choice(ones)} point {rng.choice(ones)} {rng.choice(ones)}"
        return rng.choice(tens)

    total, match = 400, 0
    for _ in range(total):
        parts = [
            rng.choice(fill) if rng.random() < 0.4 else gen_number()
            for _ in range(rng.randrange(1, 4))
        ]
        s = " ".join(parts)
        if mine(s) == hf_norm(s):
            match += 1
    assert match / total >= 0.90, f"{match}/{total}"
