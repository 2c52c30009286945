"""Continuous-batching decode == lockstep greedy, token for token.

Greedy rows are independent, and greedy decoding is causal (each token
depends only on its prefix), so for every utterance the streaming decoder
(decode/streaming.py — per-row lengths, refill scatters, per-row logits
rules) must reproduce exactly the prefix of the plain lockstep
generate_greedy output up to that row's stop length.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kotoba_whisper_tpu.core.config import PRESETS, SpecialTokens
from kotoba_whisper_tpu.decode.greedy import (
    GenerateOptions,
    generate_greedy,
    transcribe_prompt,
)
from kotoba_whisper_tpu.decode.streaming import (
    StreamConfig,
    generate_greedy_streaming,
)
from kotoba_whisper_tpu.models import whisper


@pytest.fixture(scope="module")
def setup():
    cfg = PRESETS["test-byte"]
    st = SpecialTokens.layout(n_text=256, n_langs=99)  # byte_vocab layout
    params = whisper.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    mels = (rng.standard_normal((10, cfg.num_mel_bins, 3000)) * 0.2).astype(
        np.float32
    )
    opts = GenerateOptions(
        prompt_ids=transcribe_prompt(st, st.lang_begin + 6), max_length=24
    )
    return cfg, st, params, mels, opts


@pytest.mark.parametrize("kv_dtype", ["compute", "int8", "int4"])
def test_streaming_matches_lockstep_greedy(setup, kv_dtype):
    cfg, st, params, mels, opts = setup
    full = np.asarray(
        generate_greedy(
            params, cfg, jnp.asarray(mels), opts, st, kv_dtype=kv_dtype
        )
    )
    rng = np.random.default_rng(2)
    stops = rng.integers(8, opts.max_length + 1, size=mels.shape[0])
    out = generate_greedy_streaming(
        params, cfg, mels, opts, st,
        kv_dtype=kv_dtype,
        stream=StreamConfig(batch=4, encode_batch=2, steps_per_round=3),
        stop_at=stops,
    )
    assert out.shape == full.shape
    for i, L in enumerate(stops):
        np.testing.assert_array_equal(
            out[i][:L], full[i][:L],
            err_msg=f"row {i} (stop {L}, kv_dtype {kv_dtype})",
        )
        # nothing written past the stop
        assert np.all(out[i][L:] == cfg.pad_token_id) or full[i][L - 1] == st.eot


def test_streaming_slabbed_host_source(setup):
    """A numpy source larger than source_windows is uploaded in slabs;
    output must be identical, including with N not a multiple of E
    (host-side pad path)."""
    cfg, st, params, mels, opts = setup
    m = mels[:9]  # 9 % encode_batch(2) != 0 -> host pad
    full = np.asarray(generate_greedy(params, cfg, jnp.asarray(m), opts, st))
    out = generate_greedy_streaming(
        params, cfg, m, opts, st,
        stream=StreamConfig(
            batch=4, encode_batch=2, steps_per_round=3, source_windows=4
        ),
    )
    np.testing.assert_array_equal(out, full)


def test_lockstep_stop_at(setup):
    """generate_greedy(stop_at=...): each row's output is the unrestricted
    run truncated at its stop (lockstep rows decode until the batch max
    stop, but finished rows emit pad)."""
    cfg, st, params, mels, opts = setup
    m = jnp.asarray(mels[:4])
    full = np.asarray(generate_greedy(params, cfg, m, opts, st))
    stops = np.asarray([9, 14, 24, 17])
    out = np.asarray(
        generate_greedy(
            params, cfg, m, opts, st, stop_at=jnp.asarray(stops, jnp.int32)
        )
    )
    for i, L in enumerate(stops):
        np.testing.assert_array_equal(out[i][:L], full[i][:L])
        assert np.all(out[i][L:] == cfg.pad_token_id) or full[i][L - 1] == st.eot


def test_streaming_window_larger_than_stream(setup):
    """N < W: the window never fully fills; drain still completes."""
    cfg, st, params, mels, opts = setup
    full = np.asarray(
        generate_greedy(params, cfg, jnp.asarray(mels[:3]), opts, st)
    )
    out = generate_greedy_streaming(
        params, cfg, mels[:3], opts, st,
        stream=StreamConfig(batch=8, encode_batch=4, steps_per_round=5),
    )
    np.testing.assert_array_equal(out, full)
