"""Data-layer and eval-layer tests: collator parity vs the reference's
torch collator logic, WER/CER vs jiwer-style oracles, normalizer goldens
vs transformers, filtering semantics, and the tar shard reader."""
import numpy as np
import pytest

from kotoba_whisper_tpu.core.config import SpecialTokens
from kotoba_whisper_tpu.data import collator, filtering, reazon
from kotoba_whisper_tpu.eval import metrics, normalizers
from kotoba_whisper_tpu.tokenizer.whisper_tokenizer import WhisperTokenizer

ST = SpecialTokens.for_vocab(51865)


# ---------------------------------------------------------------------------
# collator
# ---------------------------------------------------------------------------

def _torch_reference_collate(label_ids, sot, pad, lmax):
    """Torch re-statement of run_distillation.py:254-271."""
    torch = pytest.importorskip("torch")
    b = len(label_ids)
    padded = torch.full((b, lmax + 1), pad, dtype=torch.long)
    attn = torch.zeros((b, lmax + 1), dtype=torch.long)
    for i, ids in enumerate(label_ids):
        ids = list(ids)[: lmax + 1]
        padded[i, : len(ids)] = torch.tensor(ids)
        attn[i, : len(ids)] = 1
    decoder_input_ids = padded[:, :-1]
    labels = padded[:, 1:]
    labels_mask = attn[:, 1:]
    labels = labels.masked_fill(labels_mask.ne(1), -100)
    bos_index = torch.argmax((labels == sot).long(), dim=1)
    bos_index = torch.where(bos_index > 0, bos_index + 1, bos_index)
    prompt_mask = torch.arange(labels.shape[1]) < bos_index[:, None]
    labels = torch.where(prompt_mask, -100, labels)
    return decoder_input_ids.numpy(), labels.numpy()


def test_collator_matches_reference_logic():
    cfg = collator.CollatorConfig(max_target_length=16)
    sot, pad = cfg.decoder_start_token_id, cfg.pad_token_id
    seqs = [
        [sot, 5, 6, 7, ST.eot],                       # plain
        [ST.startofprev, 9, 10, sot, 5, ST.eot],      # prompted
        [sot, ST.eot],                                # minimal
        list(range(100, 100 + 20)),                   # overlong (truncated)
    ]
    got = collator.collate_labels(seqs, cfg)
    ref_dec, ref_lab = _torch_reference_collate(seqs, sot, pad, 16)
    np.testing.assert_array_equal(got["decoder_input_ids"], ref_dec)
    np.testing.assert_array_equal(got["labels"], ref_lab)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def test_wer_cer_known_values():
    assert metrics.wer(["a b c"], ["a b c"]) == 0.0
    assert metrics.wer(["a x c"], ["a b c"]) == pytest.approx(1 / 3)
    assert metrics.wer([""], ["a b"]) == pytest.approx(1.0)
    # corpus-level pooling: (1 + 0) edits / (3 + 1) ref words
    assert metrics.wer(["a x c", "d"], ["a b c", "d"]) == pytest.approx(1 / 4)
    assert metrics.cer(["abcd"], ["abxd"]) == pytest.approx(1 / 4)
    assert metrics.cer(["こんにちは"], ["こんばんは"]) == pytest.approx(2 / 5)


def test_wer_matches_jiwer_if_available():
    jiwer = pytest.importorskip("jiwer")
    preds = ["the quick brown fox", "jumps over", "a dog"]
    refs = ["the quick brown cat", "jumped over it", "a dog"]
    assert metrics.wer(preds, refs) == pytest.approx(jiwer.wer(refs, preds))


# ---------------------------------------------------------------------------
# normalizers
# ---------------------------------------------------------------------------

CASES = [
    "Hello, World!",
    "こんにちは。世界  (笑) [music]",
    "ÀÇÉ naïve café",
    "A  B\t C ",
    "「日本語」のテスト、です。",
    "MIXED case And 123 Numbers",
]


def test_basic_normalizer_matches_hf():
    trf = pytest.importorskip("transformers")
    from transformers.models.whisper.english_normalizer import (
        BasicTextNormalizer as HFBasic,
    )

    ours = normalizers.BasicTextNormalizer()
    hf = HFBasic()
    for s in CASES:
        assert ours(s) == hf(s), s


def test_ja_normalize_pipeline():
    norm = normalizers.make_normalizer("ja")
    assert norm("こんにちは。 世界") == "こんにちは世界"
    assert " " not in norm("a b c 日本")


def test_english_normalizer_contractions():
    en = normalizers.EnglishTextNormalizer()
    assert en("I won't do it") == "i will not do it"
    assert en("they're here") == "they are here"


# ---------------------------------------------------------------------------
# filtering
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tok():
    return WhisperTokenizer.byte_vocab()


def test_is_wer_in_range(tok):
    norm = normalizers.make_normalizer("ja")
    good = tok.encode("こんにちは")
    assert filtering.is_wer_in_range("こんにちは", good, tok, norm, 10.0)
    bad = tok.encode("全然違う内容のテキストです")
    assert not filtering.is_wer_in_range("こんにちは", bad, tok, norm, 10.0)
    assert not filtering.is_wer_in_range("", good, tok, norm, 10.0)
    assert not filtering.is_wer_in_range("こんにちは", None, tok, norm, 10.0)


def test_label_preparer_timestamp_sampling(tok):
    st = tok.special
    base = tok.sot_sequence("ja", "transcribe") + [st.timestamp_begin] + tok.encode(
        "hi"
    ) + [st.timestamp_begin + 100, st.eot]

    # timestamp_probability=1: timestamps always kept
    prep = filtering.LabelPreparer(
        tok, filtering.FilterConfig(timestamp_probability=1.0, condition_on_prev_probability=0.0)
    )
    out = prep.prepare(base)
    assert any(i >= st.timestamp_begin for i in out)
    assert out[-1] == st.eot

    # timestamp_probability=0: stripped + <|notimestamps|> at position 3
    prep0 = filtering.LabelPreparer(
        tok, filtering.FilterConfig(timestamp_probability=0.0, condition_on_prev_probability=0.0)
    )
    out0 = prep0.prepare(base)
    assert all(i < st.timestamp_begin for i in out0)
    assert out0[3] == st.no_timestamps
    assert out0[:3] == base[:3]


def test_label_preparer_prompting(tok):
    st = tok.special
    mk = lambda text: tok.sot_sequence("ja", "transcribe") + tok.encode(text) + [st.eot]
    prep = filtering.LabelPreparer(
        tok,
        filtering.FilterConfig(
            timestamp_probability=1.0, condition_on_prev_probability=1.0
        ),
    )
    first = prep.prepare(mk("first utterance"))
    second = prep.prepare(mk("second one"))
    assert second[0] == st.startofprev
    sot_pos = second.index(st.sot)
    prompt = second[1:sot_pos]
    assert tok.decode(prompt) == "first utterance"
    assert prep.labels_in_range(second)
    assert prep.audio_in_range(16000)
    assert not prep.audio_in_range(16000 * 31)


# ---------------------------------------------------------------------------
# reazon reader
# ---------------------------------------------------------------------------

def _wav_bytes(audio, sr):
    import struct

    pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, 1,
        sr, sr * 2, 2, 16, b"data", len(pcm),
    )
    return hdr + pcm


def test_tar_reader_roundtrip(tmp_path, rng):
    wav = _wav_bytes(rng.standard_normal(1600) * 0.1, 16000)
    shard = [
        ("000/utt1.wav", wav),
        ("000/utt2.wav", wav),
        ("000/readme.txt", b"skip me"),
    ]
    tar_path = str(tmp_path / "000.tar")
    reazon.write_tar_shard(tar_path, shard)
    (tmp_path / "transcript.tsv").write_text(
        "000/utt1.wav\tこんにちは\n000/utt2.wav\tさようなら\n", encoding="utf-8"
    )
    utts = list(reazon.iter_dataset_dir(str(tmp_path)))
    assert [u.name for u in utts] == ["000/utt1.wav", "000/utt2.wav"]
    assert utts[0].transcription == "こんにちは"
    assert reazon.check_tar_integrity(tar_path)

    from kotoba_whisper_tpu.utils import native

    audio, rate = native.decode_audio(utts[0].audio_bytes, 16000)
    assert rate == 16000 and len(audio) == 1600


def test_broken_tar_detected(tmp_path):
    p = tmp_path / "bad.tar"
    p.write_bytes(b"definitely not a tar file")
    assert not reazon.check_tar_integrity(str(p))
