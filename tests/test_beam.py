"""Beam search tests: k=1 equivalence with greedy, score dominance over
greedy at k>1, determinism, and finished-hypothesis bookkeeping."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kotoba_whisper_tpu.core.config import SpecialTokens, WhisperConfig
from kotoba_whisper_tpu.decode.beam import generate_beam
from kotoba_whisper_tpu.decode.greedy import GenerateOptions, generate_greedy
from kotoba_whisper_tpu.decode.logits_rules import apply_rules
from kotoba_whisper_tpu.models import whisper

VOCAB = 51865
ST = SpecialTokens.for_vocab(VOCAB)


@pytest.fixture(scope="module")
def setup():
    cfg = WhisperConfig(
        vocab_size=VOCAB,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_layers=2,
        decoder_attention_heads=4,
        encoder_ffn_dim=128,
        decoder_ffn_dim=128,
        max_source_positions=64,
        max_target_positions=48,
    )
    params = whisper.init_params(jax.random.key(3), cfg)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(
        rng.standard_normal((2, cfg.num_mel_bins, 2 * cfg.max_source_positions)),
        jnp.float32,
    )
    prompt = (ST.sot, ST.lang_begin + 6, ST.transcribe)
    opts = GenerateOptions(prompt_ids=prompt, max_length=24)
    return cfg, params, mel, opts


def _seq_logprob(params, cfg, mel, tokens, opts):
    """Sum of per-token log-probs of `tokens` under the model, HF beam
    semantics: log_softmax of the RAW logits first, rules applied to the
    log-probs after (masking without renormalization)."""
    p = len(opts.prompt_ids)
    rc = opts.rule_config(ST)
    enc = whisper.encode(params, cfg, mel)
    cache = whisper.init_cache(params, cfg, enc, capacity=opts.max_length)
    lg, cache = whisper.decode(params, cfg, tokens[:, : p - 1], cache=cache)
    total = np.zeros(tokens.shape[0])
    alive = np.ones(tokens.shape[0], bool)
    buf = np.asarray(tokens)
    for cur_len in range(p, opts.max_length):
        lg, cache = whisper.decode(
            params, cfg, tokens[:, cur_len - 1 : cur_len], cache=cache
        )
        logp = np.asarray(
            apply_rules(
                jax.nn.log_softmax(jnp.asarray(lg[:, 0], jnp.float32), axis=-1),
                jnp.asarray(buf), jnp.asarray(cur_len), rc,
            )
        )
        for i in range(tokens.shape[0]):
            t = int(buf[i, cur_len])
            if alive[i]:
                total[i] += logp[i, t]
                if t == ST.eot:
                    alive[i] = False
    return total


def test_beam1_matches_greedy(setup):
    cfg, params, mel, opts = setup
    g = np.asarray(generate_greedy(params, cfg, mel, opts, ST))
    b, scores = generate_beam(params, cfg, mel, opts, ST, num_beams=1)
    b = np.asarray(b)
    for i in range(g.shape[0]):
        gl = g[i].tolist()
        bl = b[i].tolist()
        ge = gl.index(ST.eot) if ST.eot in gl else len(gl)
        be = bl.index(ST.eot) if ST.eot in bl else len(bl)
        assert gl[: ge + 1] == bl[: be + 1]


def test_beam_dominates_greedy_on_finishing_model(setup):
    """With the eot embedding boosted so sequences finish quickly, both
    greedy and beam terminate; the best finished beam hypothesis must score
    at least as well as the greedy one (which lies in beam's search space
    at every step until it finishes). Also checks the returned beam score
    against an independent recomputation."""
    cfg, params, mel, opts = setup
    # steer the final-LN bias toward the eot embedding so logits[eot] is
    # reliably dominant (≈ c·‖emb[eot]‖² vs small random dot products);
    # the timestamp rules still shape where eot is permitted
    emb = params["decoder"]["embed_tokens"]["embedding"]
    boosted = dict(params)
    boosted["decoder"] = dict(params["decoder"])
    boosted["decoder"]["layer_norm"] = {
        "scale": params["decoder"]["layer_norm"]["scale"],
        "bias": params["decoder"]["layer_norm"]["bias"] + 40.0 * emb[ST.eot],
    }
    g = np.asarray(generate_greedy(boosted, cfg, mel, opts, ST))
    bt, bscore = generate_beam(
        boosted, cfg, mel, opts, ST, num_beams=4, length_penalty=1.0
    )
    bt = np.asarray(bt)
    assert all(ST.eot in g[i].tolist() for i in range(g.shape[0])), "greedy unfinished"
    assert all(ST.eot in bt[i].tolist() for i in range(bt.shape[0])), "beam unfinished"

    g_lp = _seq_logprob(boosted, cfg, mel, jnp.asarray(g), opts)
    b_lp = _seq_logprob(boosted, cfg, mel, jnp.asarray(bt), opts)

    def pen_len(row):
        row = row.tolist()
        e = row.index(ST.eot)
        return max(e + 1 - len(opts.prompt_ids), 1)

    for i in range(g.shape[0]):
        recomputed = b_lp[i] / pen_len(bt[i])
        np.testing.assert_allclose(
            float(np.asarray(bscore)[i]), recomputed, atol=1e-3
        )
        gs = g_lp[i] / pen_len(g[i])
        assert recomputed >= gs - 1e-4, (recomputed, gs)


def test_beam_deterministic(setup):
    cfg, params, mel, opts = setup
    t1, s1 = generate_beam(params, cfg, mel, opts, ST, num_beams=3)
    t2, s2 = generate_beam(params, cfg, mel, opts, ST, num_beams=3)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_beam_output_wellformed(setup):
    cfg, params, mel, opts = setup
    t, s = generate_beam(params, cfg, mel, opts, ST, num_beams=4)
    t = np.asarray(t)
    p = len(opts.prompt_ids)
    for i in range(t.shape[0]):
        assert t[i, :p].tolist() == list(opts.prompt_ids)
        # first sampled token is a timestamp (initial-timestamp rule)
        assert t[i, p] >= ST.timestamp_begin
        assert np.isfinite(float(np.asarray(s)[i]))


def test_beam_int8_kv(setup):
    """Beam search over an int8 KV cache: runs, well-formed, and the
    scale fields follow the beam reorder (no silent drop)."""
    cfg, params, mel, opts = setup
    t, s = generate_beam(
        params, cfg, mel, opts, ST, num_beams=3, kv_dtype="int8"
    )
    t = np.asarray(t)
    p = len(opts.prompt_ids)
    assert (t[:, p] >= ST.timestamp_begin).all()
    assert np.isfinite(np.asarray(s)).all()


def test_beam_int4_kv(setup):
    """Beam search over an int4 cross-KV cache (per-head scales follow
    the beam reorder through the scan carry)."""
    cfg, params, mel, opts = setup
    t, s = generate_beam(
        params, cfg, mel, opts, ST, num_beams=3, kv_dtype="int4"
    )
    t = np.asarray(t)
    p = len(opts.prompt_ids)
    assert (t[:, p] >= ST.timestamp_begin).all()
    assert np.isfinite(np.asarray(s)).all()
