"""ESB corpus preparers: synthetic raw-layout fixtures per corpus.

Each test builds a miniature copy of the corpus's raw distribution layout
and checks the manifest rows AND the reference's transcript-cleanup
semantics (misc/esb_test.py:331-1105) survive exactly.
"""
import json
import os
import struct

import numpy as np
import pytest

from kotoba_whisper_tpu.data import esb


def _read_manifest(out):
    with open(os.path.join(out, "manifest.jsonl")) as f:
        return [json.loads(l) for l in f if l.strip()]


def test_cleanup_functions_exact():
    # tedlium: stm suffix trim, <unk>, contractions, whitespace, ignores
    assert esb.clean_tedlium("hello <unk> it 's FINE  now (key-1)") == \
        "hello it's fine now"
    assert esb.clean_tedlium("ignore_time_segment_in_scoring") is None
    assert esb.clean_tedlium("<unk>") is None
    # gigaspeech: junk tags, spelled punctuation, lowercase
    assert esb.clean_gigaspeech("HELLO <COMMA> WORLD <PERIOD> <SIL>".lower()
                                .upper().lower()) == "hello, world. <sil>".replace(" <sil>", "")
    assert esb.clean_gigaspeech("YES <QUESTIONMARK>") == "yes?"
    assert esb.clean_gigaspeech("<SIL>".lower()) is None
    # earnings22: junk tokens removed, case preserved
    assert esb.clean_earnings("Revenue <noise> grew  10%") == "Revenue grew 10%"
    assert esb.clean_earnings("<crosstalk>") is None
    # common_voice: quote handling
    assert esb.clean_common_voice('"Hello there"') == "Hello there"
    assert esb.clean_common_voice('a ""quoted"" word') == 'a "quoted" word'
    assert esb.clean_common_voice("") is None


def test_maybe_trim_suffix():
    assert esb.maybe_trim_suffix("hello world (key)") == "hello world"
    assert esb.maybe_trim_suffix("hello world") == "hello world"
    assert esb.maybe_trim_suffix("single") == "single"


def _sphere_bytes(samples: np.ndarray, rate=16000) -> bytes:
    head = (
        "NIST_1A\n   1024\n"
        f"sample_rate -i {rate}\n"
        "channel_count -i 1\n"
        "sample_n_bytes -i 2\n"
        "sample_coding -s3 pcm\n"
        "sample_byte_format -s2 01\n"
        "end_head\n"
    ).encode()
    return head + b" " * (1024 - len(head)) + samples.astype("<i2").tobytes()


def test_tedlium_prepare(tmp_path):
    raw = tmp_path / "raw" / "test"
    raw.mkdir(parents=True)
    rate = 16000
    samples = (np.arange(rate * 4) % 100).astype(np.int16)
    (raw / "TalkA.sph").write_bytes(_sphere_bytes(samples, rate))
    (raw / "TalkA.stm").write_text(
        "TalkA 1 spk1 0.50 1.50 <o,f0,female> Hello it 's WORLD (key)\n"
        "TalkA 1 spk1 2.00 3.00 <o,f0,male> ignore_time_segment_in_scoring\n"
        "TalkA 1 spk2 3.00 3.50 <o,f0,male> second <unk> segment\n"
    )
    out = tmp_path / "out"
    n = esb.prepare_corpus("tedlium", str(tmp_path / "raw"), str(out))
    rows = _read_manifest(str(out))
    assert n == len(rows) == 2
    assert rows[0]["text"] == "hello it's world"
    assert rows[1]["text"] == "second segment"
    # segment audio: 1.0 s of PCM cut at [0.5, 1.5)
    with open(rows[0]["audio"], "rb") as f:
        wav = f.read()
    assert wav[:4] == b"RIFF"
    pcm = np.frombuffer(wav[44:], "<i2")
    np.testing.assert_array_equal(pcm, samples[rate // 2 : rate + rate // 2])


def test_sphere_big_endian(tmp_path):
    samples = np.asarray([1, -2, 300, -400], np.int16)
    head = (
        "NIST_1A\n   1024\n"
        "sample_rate -i 16000\n"
        "sample_n_bytes -i 2\n"
        "sample_coding -s3 pcm\n"
        "sample_byte_format -s2 10\n"
        "end_head\n"
    ).encode()
    p = tmp_path / "be.sph"
    p.write_bytes(head + b" " * (1024 - len(head)) + samples.astype(">i2").tobytes())
    pcm, rate, nbytes = esb.read_sphere(str(p))
    np.testing.assert_array_equal(np.frombuffer(pcm, "<i2"), samples)


def test_ami_prepare(tmp_path):
    raw = tmp_path / "raw" / "EN2001a"
    raw.mkdir(parents=True)
    _id = "AMI_EN2001a_H00_MEE068_0000000_0000100"
    (raw / f"eval_{_id.lower()}.wav").write_bytes(b"fake")
    (tmp_path / "raw" / "eval.txt").write_text(f"{_id} HELLO THERE WORLD\n")
    out = tmp_path / "out"
    n = esb.prepare_corpus("ami", str(tmp_path / "raw"), str(out), "eval")
    rows = _read_manifest(str(out))
    assert n == 1 and rows[0]["id"] == _id
    assert rows[0]["text"] == "HELLO THERE WORLD"
    assert rows[0]["audio"].endswith(f"eval_{_id.lower()}.wav")


def test_spgispeech_prepare(tmp_path):
    d = tmp_path / "raw" / "test" / "ab12"
    d.mkdir(parents=True)
    (d / "1.wav").write_bytes(b"fake")
    (tmp_path / "raw" / "meta.csv").write_text(
        "wav_filename|wav_filesize|transcript\nab12/1.wav|4|Quarterly results.\n"
    )
    out = tmp_path / "out"
    n = esb.prepare_corpus("spgispeech", str(tmp_path / "raw"), str(out))
    rows = _read_manifest(str(out))
    assert n == 1 and rows[0]["text"] == "Quarterly results."


def test_voxpopuli_prepare(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "20180101-x.wav").write_bytes(b"fake")
    (raw / "meta.tsv").write_text(
        "id\tnormalized_text\n20180101-x\tThe Parliament MET today\n"
    )
    out = tmp_path / "out"
    n = esb.prepare_corpus("voxpopuli", str(raw), str(out))
    rows = _read_manifest(str(out))
    assert n == 1 and rows[0]["text"] == "the parliament met today"


def test_librispeech_prepare(tmp_path):
    d = tmp_path / "raw" / "1089" / "134686"
    d.mkdir(parents=True)
    (d / "1089-134686-0000.flac").write_bytes(b"fake")
    (d / "1089-134686.trans.txt").write_text(
        "1089-134686-0000 HE HOPED THERE WOULD BE STEW\n"
    )
    out = tmp_path / "out"
    n = esb.prepare_corpus("librispeech", str(tmp_path / "raw"), str(out))
    rows = _read_manifest(str(out))
    assert n == 1 and rows[0]["text"] == "he hoped there would be stew"
    assert rows[0]["id"] == "1089-134686-0000"


def test_common_voice_prepare(tmp_path):
    raw = tmp_path / "raw"
    clips = raw / "clips"
    clips.mkdir(parents=True)
    for name in ("a.mp3", "b.mp3", "c.mp3"):
        (clips / name).write_bytes(b"fake")
    (raw / "test.tsv").write_text(
        "client_id\tpath\tsentence\n"
        'u1\ta.mp3\t"Wrapped in quotes"\n'
        "u2\tb\tDouble \"\"quoted\"\" word\n"
        "u3\tc.mp3\t\n"
    )
    out = tmp_path / "out"
    n = esb.prepare_corpus("common_voice", str(raw), str(out), "test")
    rows = _read_manifest(str(out))
    assert n == 2
    assert rows[0]["text"] == "Wrapped in quotes"
    assert rows[1]["text"] == 'Double "quoted" word'
    assert rows[1]["audio"].endswith("b.mp3")  # .mp3 suffix added


def test_gigaspeech_prepare(tmp_path):
    raw = tmp_path / "raw" / "test_chunks_0000"
    raw.mkdir(parents=True)
    (raw / "YOU1_S01.wav").write_bytes(b"fake")
    (raw / "YOU1_S02.wav").write_bytes(b"fake")
    (tmp_path / "raw" / "meta.csv").write_text(
        "sid,text_tn\n"
        "YOU1_S01,HELLO <COMMA> WORLD <PERIOD>\n"
        "YOU1_S02,<SIL>\n"
    )
    out = tmp_path / "out"
    n = esb.prepare_corpus("gigaspeech", str(tmp_path / "raw"), str(out))
    rows = _read_manifest(str(out))
    assert n == 1
    assert rows[0]["text"] == "hello, world."


def test_earnings22_prepare(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "4320_chunk_001.wav").write_bytes(b"fake")
    (raw / "4320_chunk_002.wav").write_bytes(b"fake")
    (raw / "metadata.csv").write_text(
        "file,sentence,source_id\n"
        "4320_chunk_001.wav,Revenue <noise> grew,4320\n"
        "4320_chunk_002.wav,<inaudible>,4320\n"
    )
    out = tmp_path / "out"
    n = esb.prepare_corpus("earnings22", str(raw), str(out))
    rows = _read_manifest(str(out))
    assert n == 1
    assert rows[0]["text"] == "Revenue grew"


def test_all_eight_preparers_registered():
    assert sorted(esb.PREPARERS) == [
        "ami", "common_voice", "earnings22", "gigaspeech",
        "librispeech", "spgispeech", "tedlium", "voxpopuli",
    ]
