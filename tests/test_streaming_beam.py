"""Continuous-batching beam search == lockstep beam, tokens AND scores.

Beam groups are independent and each group's step sequence reproduces the
lockstep algorithm (decode/beam.py — itself token/score-exact vs HF
generate(num_beams=N), tests/test_beam_parity.py), so for every utterance
the streaming beam decoder must emit exactly generate_beam's tokens and
length-penalized score at that utterance's stop length.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kotoba_whisper_tpu.core.config import PRESETS, SpecialTokens
from kotoba_whisper_tpu.decode.beam import generate_beam
from kotoba_whisper_tpu.decode.greedy import GenerateOptions, transcribe_prompt
from kotoba_whisper_tpu.decode.streaming_beam import (
    BeamStreamConfig,
    generate_beam_streaming,
)
from kotoba_whisper_tpu.models import whisper


@pytest.fixture(scope="module")
def setup():
    cfg = PRESETS["test-byte"]
    st = SpecialTokens.layout(n_text=256, n_langs=99)
    params = whisper.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    mels = (rng.standard_normal((6, cfg.num_mel_bins, 3000)) * 0.2).astype(
        np.float32
    )
    opts = GenerateOptions(
        prompt_ids=transcribe_prompt(st, st.lang_begin + 6), max_length=20
    )
    return cfg, st, params, mels, opts


@pytest.mark.parametrize("kv_dtype", ["compute", "int8", "int4"])
def test_streaming_beam_matches_lockstep(setup, kv_dtype):
    """layout="scatter" (lockstep slot order): bitwise tokens; scores to
    f32 ulp. (Scores were bitwise before the shared-cross-KV layout; the
    beam-shared cross-attention's reduction tiling now depends on the
    window's group count, so a 1-ulp score drift vs the lockstep program
    shape is expected — tokens only diverge if a top-k tie sits within
    that ulp, which the scatter slot order still prevents for the
    self-attention sums.)"""
    cfg, st, params, mels, opts = setup
    k = 3
    ref_tok, ref_sc = generate_beam(
        params, cfg, jnp.asarray(mels), opts, st, num_beams=k,
        kv_dtype=kv_dtype,
    )
    out_tok, out_sc = generate_beam_streaming(
        params, cfg, mels, opts, st, kv_dtype=kv_dtype,
        stream=BeamStreamConfig(
            groups=3, num_beams=k, encode_batch=2, steps_per_round=4,
            layout="scatter",
        ),
    )
    np.testing.assert_array_equal(out_tok, np.asarray(ref_tok))
    tol = 1e-6 if kv_dtype == "compute" else 1e-5
    np.testing.assert_allclose(
        out_sc, np.asarray(ref_sc), atol=tol, rtol=1e-6
    )


def test_streaming_beam_int4_ring(setup):
    """int4 KV on the fast ring layout (the wide-window HBM config the
    on-chip beam stream uses): tokens exact vs lockstep int4."""
    cfg, st, params, mels, opts = setup
    k = 3
    ref_tok, _ = generate_beam(
        params, cfg, jnp.asarray(mels), opts, st, num_beams=k,
        kv_dtype="int4",
    )
    out_tok, _ = generate_beam_streaming(
        params, cfg, mels, opts, st, kv_dtype="int4",
        stream=BeamStreamConfig(
            groups=3, num_beams=k, encode_batch=2, steps_per_round=4
        ),
    )
    np.testing.assert_array_equal(out_tok, np.asarray(ref_tok))


def test_streaming_beam_ring_layout(setup):
    """layout="ring" (fast path): tokens exact; scores agree to f32 ulp
    (ring rotation permutes the attention summation order)."""
    cfg, st, params, mels, opts = setup
    k = 3
    ref_tok, ref_sc = generate_beam(
        params, cfg, jnp.asarray(mels), opts, st, num_beams=k
    )
    out_tok, out_sc = generate_beam_streaming(
        params, cfg, mels, opts, st,
        stream=BeamStreamConfig(
            groups=3, num_beams=k, encode_batch=2, steps_per_round=4
        ),
    )
    np.testing.assert_array_equal(out_tok, np.asarray(ref_tok))
    np.testing.assert_allclose(out_sc, np.asarray(ref_sc), atol=1e-5)


def test_streaming_beam_varied_stops(setup):
    """Per-utterance stop lengths reproduce per-utterance lockstep runs
    with that max_length (tokens and scores)."""
    cfg, st, params, mels, opts = setup
    k = 2
    rng = np.random.default_rng(3)
    stops = rng.integers(10, opts.max_length + 1, size=mels.shape[0])
    out_tok, out_sc = generate_beam_streaming(
        params, cfg, mels, opts, st,
        stream=BeamStreamConfig(
            groups=2, num_beams=k, encode_batch=1, steps_per_round=5,
            layout="scatter",
        ),
        stop_at=stops,
    )
    for i, L in enumerate(stops):
        o = dataclasses.replace(opts, max_length=int(L))
        rt, rs = generate_beam(
            params, cfg, jnp.asarray(mels[i : i + 1]), o, st, num_beams=k
        )
        np.testing.assert_array_equal(
            out_tok[i, :L], np.asarray(rt)[0], err_msg=f"row {i} stop {L}"
        )
        np.testing.assert_allclose(
            out_sc[i], np.asarray(rs)[0], atol=1e-6, rtol=1e-6
        )


def test_streaming_beam_length_penalty(setup):
    cfg, st, params, mels, opts = setup
    k, lp = 2, 0.6
    ref_tok, ref_sc = generate_beam(
        params, cfg, jnp.asarray(mels[:4]), opts, st, num_beams=k,
        length_penalty=lp,
    )
    out_tok, out_sc = generate_beam_streaming(
        params, cfg, mels[:4], opts, st,
        stream=BeamStreamConfig(
            groups=2, num_beams=k, encode_batch=2, length_penalty=lp,
            layout="scatter",
        ),
    )
    np.testing.assert_array_equal(out_tok, np.asarray(ref_tok))
    np.testing.assert_allclose(out_sc, np.asarray(ref_sc),
                               atol=1e-5, rtol=1e-6)
