"""Beam-search parity vs HF `generate(num_beams=N)`.

The reference pseudo-labels with configurable beam count
(run_pseudo_labelling.py:302-311); round-1 validated beam search only by
invariants. This compares token sequences (and final length-penalized
scores) against HF's WhisperForConditionalGeneration.generate on random
small models across seeds, beam widths, and length penalties — including
timestamp rules, which interact with beam pruning.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
trf = pytest.importorskip("transformers")

import jax.numpy as jnp

from kotoba_whisper_tpu.core.config import SpecialTokens, WhisperConfig
from kotoba_whisper_tpu.decode.beam import generate_beam
from kotoba_whisper_tpu.decode.greedy import GenerateOptions
from kotoba_whisper_tpu.models import hf_import

VOCAB = 51865
ST = SpecialTokens.for_vocab(VOCAB)


def _make_models(seed):
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
    hf_cfg = trf.WhisperConfig(
        vocab_size=cfg.vocab_size,
        num_mel_bins=cfg.num_mel_bins,
        d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers,
        encoder_attention_heads=cfg.encoder_attention_heads,
        decoder_layers=cfg.decoder_layers,
        decoder_attention_heads=cfg.decoder_attention_heads,
        encoder_ffn_dim=cfg.encoder_ffn_dim,
        decoder_ffn_dim=cfg.decoder_ffn_dim,
        max_source_positions=cfg.max_source_positions,
        max_target_positions=cfg.max_target_positions,
        begin_suppress_tokens=None,
        suppress_tokens=None,
    )
    torch.manual_seed(seed)
    model = trf.WhisperForConditionalGeneration(hf_cfg).eval()
    params = hf_import.params_from_hf_state_dict(model.state_dict(), cfg)
    return cfg, model, params


@pytest.mark.parametrize(
    "seed,num_beams,length_penalty",
    [(1, 5, 1.0), (2, 3, 1.0), (3, 5, 0.6), (4, 2, 1.4)],
)
def test_beam_matches_hf_generate(seed, num_beams, length_penalty):
    cfg, model, params = _make_models(seed)
    rng = np.random.default_rng(seed)
    b = 2
    mel = rng.standard_normal(
        (b, cfg.num_mel_bins, 2 * cfg.max_source_positions)
    ).astype(np.float32)

    lang = ST.lang_begin + 6  # <|ja|>
    prompt = (ST.sot, lang, ST.transcribe)
    max_len = 24

    gen_cfg = trf.GenerationConfig(
        max_length=max_len,
        num_beams=num_beams,
        length_penalty=length_penalty,
        do_sample=False,
        early_stopping=False,
        decoder_start_token_id=cfg.decoder_start_token_id,
        eos_token_id=ST.eot,
        pad_token_id=cfg.pad_token_id,
        forced_decoder_ids=None,
        no_timestamps_token_id=ST.no_timestamps,
        max_initial_timestamp_index=50,
        begin_suppress_tokens=None,
        suppress_tokens=None,
        return_timestamps=True,
        is_multilingual=True,
        lang_to_id={"<|ja|>": lang},
        task_to_id={"transcribe": ST.transcribe, "translate": ST.translate},
        output_scores=True,
        return_dict_in_generate=True,
    )
    with torch.no_grad():
        out = model.generate(
            torch.from_numpy(mel),
            generation_config=gen_cfg,
            language="ja",
            task="transcribe",
            return_timestamps=True,
        )
    # per-row best hypothesis (prompt-inclusive) + its length-penalized
    # score live on the inner GenerationMixin result per segment
    golden_rows, hf_scores = [], []
    for k in range(b):
        r = out["segments"][k][0]["result"]
        golden_rows.append(np.asarray(r["sequences"]).reshape(-1))
        hf_scores.append(float(np.asarray(r["sequences_scores"]).reshape(-1)[0]))
    hf_scores = np.asarray(hf_scores)

    opts = GenerateOptions(prompt_ids=prompt, max_length=max_len)
    tokens, scores = generate_beam(
        params, cfg, jnp.asarray(mel), opts, ST,
        num_beams=num_beams, length_penalty=length_penalty,
    )
    tokens, scores = np.asarray(tokens), np.asarray(scores)

    for k in range(b):
        g = golden_rows[k]
        # strip HF right-padding after eot
        if (g == ST.eot).any():
            g = g[: int(np.argmax(g == ST.eot)) + 1]
        np.testing.assert_array_equal(
            tokens[k, : len(g)], g,
            err_msg=f"row {k} seed {seed} beams {num_beams} lp {length_penalty}",
        )
        assert np.all(tokens[k, len(g):] == cfg.pad_token_id)
    np.testing.assert_allclose(scores, hf_scores, atol=2e-3, rtol=1e-3)
