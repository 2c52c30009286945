"""Long-form chunking tests: chunk_iter parity vs the HF pipeline helper,
longest-common-sequence merge parity, and an end-to-end chunked transcribe
on a synthetic model."""
import numpy as np
import pytest

from kotoba_whisper_tpu.decode import longform
from kotoba_whisper_tpu.tokenizer.whisper_tokenizer import WhisperTokenizer


def test_chunk_boundaries_match_hf_chunk_iter(rng):
    """Same (length, left, right) stride triples as the pipeline's
    chunk_iter for several audio lengths."""
    trf = pytest.importorskip("transformers")
    from transformers.pipelines.automatic_speech_recognition import chunk_iter

    fe = trf.WhisperFeatureExtractor(feature_size=80)
    cfg = longform.ChunkingConfig(chunk_length_s=15.0)
    for dur_s in [4.0, 15.0, 20.0, 31.7, 60.0]:
        audio = rng.standard_normal(int(16000 * dur_s)).astype(np.float32)
        golden = [
            c["stride"]
            for c in chunk_iter(
                audio, fe, cfg.chunk_len, cfg.stride, cfg.stride
            )
        ]
        ours = [
            (len(c.audio), c.stride_left, c.stride_right)
            for c in longform.chunk_audio(audio, cfg)
        ]
        assert ours == golden, dur_s


def test_lcs_merge_matches_hf(rng):
    trf = pytest.importorskip("transformers")
    from transformers.pipelines.automatic_speech_recognition import (
        _find_longest_common_sequence,
    )

    class FakeTok:
        all_special_ids = [0]

    for trial in range(5):
        base = rng.integers(5, 50, 40).tolist()
        # overlapping windows with noise in the overlap
        seqs = [base[:18], base[12:30], base[24:40]]
        if trial % 2:
            seqs[1][2] = 99  # corrupt one overlap token
        golden = _find_longest_common_sequence(
            [(np.asarray(s), None) for s in seqs], FakeTok()
        ).tolist()
        ours = longform.find_longest_common_sequence(seqs)
        assert ours == golden


def test_transcribe_long_form_schema():
    tok = WhisperTokenizer.byte_vocab()
    st = tok.special
    cfg = longform.ChunkingConfig(chunk_length_s=15.0)
    audio = np.zeros(int(16000 * 31.0), np.float32)

    prompt = tok.sot_sequence("ja", "transcribe")

    def fake_generate(batch):
        n = batch.shape[0]
        rows = []
        for i in range(n):
            text = tok.encode(f"chunk{i} ")
            rows.append(
                prompt
                + [st.timestamp_begin]
                + text
                + [st.timestamp_begin + 250, st.eot]
            )
        lmax = max(len(r) for r in rows)
        out = np.full((n, lmax), 0, np.int32)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r
        return out

    res = longform.transcribe_long_form(audio, tok, fake_generate, cfg)
    assert set(res) == {"text", "chunks"}
    assert res["text"].startswith("chunk0")
    assert all(
        isinstance(c["timestamp"], tuple) and len(c["timestamp"]) == 2
        for c in res["chunks"]
    )
    # chunk starts shift by the 10 s step
    starts = [c["timestamp"][0] for c in res["chunks"]]
    assert starts == sorted(starts)
    assert len(res["chunks"]) == 3  # 31 s -> 3 chunks

    # token-merge path
    res2 = longform.transcribe_long_form(
        audio, tok, fake_generate, cfg, return_timestamps=False
    )
    assert "chunk0" in res2["text"]
