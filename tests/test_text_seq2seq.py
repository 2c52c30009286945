"""M2M100/NLLB text seq2seq parity vs HF transformers (offline oracle).

Same golden strategy as the Whisper model tests (docs/PARITY.md): build a
random torch M2M100ForConditionalGeneration, import its state dict, and
require logit closeness + token-exact greedy decode. Covers the cascaded
S2T translation model family
(/root/reference/misc/cascaded_s2t_translation/ja_cascaded_s2t_translation.py:45-48).
"""
from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from kotoba_whisper_tpu.models import text_seq2seq as ts

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import M2M100Config, M2M100ForConditionalGeneration

    hf_cfg = M2M100Config(
        vocab_size=120,
        d_model=32,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        max_position_embeddings=64,
        pad_token_id=1,
        eos_token_id=2,
        bos_token_id=0,
        decoder_start_token_id=2,
        scale_embedding=True,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        activation_function="relu",
    )
    torch.manual_seed(0)
    model = M2M100ForConditionalGeneration(hf_cfg).eval()
    cfg = ts.config_from_hf_dict(hf_cfg.to_dict())
    params = ts.params_from_hf_state_dict(model.state_dict(), cfg)
    return model, params, cfg


def test_sinusoidal_table_matches_hf(hf_pair):
    model, params, cfg = hf_pair
    want = (
        model.model.encoder.embed_positions.weights.detach().numpy()
    )
    got = ts.sinusoidal_table(
        cfg.max_position_embeddings, cfg.d_model, cfg.pad_token_id
    )
    np.testing.assert_allclose(got[: want.shape[0]], want, atol=1e-5)


def test_forward_logits_match(hf_pair):
    model, params, cfg = hf_pair
    rng = np.random.default_rng(0)
    src = rng.integers(4, 100, size=(3, 11)).astype(np.int64)
    src[0, 8:] = cfg.pad_token_id  # right padding on one row
    src[2, 5:] = cfg.pad_token_id
    dec = rng.integers(4, 100, size=(3, 7)).astype(np.int64)
    dec[:, 0] = cfg.decoder_start_token_id

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(src),
            attention_mask=torch.tensor((src != cfg.pad_token_id).astype(np.int64)),
            decoder_input_ids=torch.tensor(dec),
        ).logits.numpy()

    enc = ts.encode(params, cfg, jnp.asarray(src))
    got = np.asarray(
        ts.decode(params, cfg, jnp.asarray(dec), enc, jnp.asarray(src))
    )
    np.testing.assert_allclose(got, out, atol=2e-4, rtol=2e-4)


def test_greedy_generate_token_exact(hf_pair):
    model, params, cfg = hf_pair
    rng = np.random.default_rng(1)
    src = rng.integers(4, 100, size=(2, 9)).astype(np.int64)
    src[1, 6:] = cfg.pad_token_id
    forced_bos = 5
    max_len = 14

    with torch.no_grad():
        want = model.generate(
            input_ids=torch.tensor(src),
            attention_mask=torch.tensor(
                (src != cfg.pad_token_id).astype(np.int64)
            ),
            forced_bos_token_id=forced_bos,
            num_beams=1,
            do_sample=False,
            max_length=max_len,
        ).numpy()

    got = np.asarray(
        ts.generate_greedy_text(
            params, cfg, jnp.asarray(src),
            forced_bos=forced_bos, max_length=max_len,
        )
    )
    # HF trims to the longest finished row; ours is fixed (B, max_length)
    # padded with pad_token_id — compare on HF's length
    np.testing.assert_array_equal(got[:, : want.shape[1]], want)
    assert np.all(got[:, want.shape[1]:] == cfg.pad_token_id)


def test_nllb_translate_fn_end_to_end(hf_pair, tmp_path):
    """Full loadable-MT path: HF checkpoint dir (save_pretrained +
    tokenizer.json) -> make_nllb_translate_fn -> text out, token-matched
    against HF generate + oracle decode."""
    from tokenizers import AddedToken, Tokenizer, models, normalizers
    from tokenizers import pre_tokenizers

    from kotoba_whisper_tpu.eval.cascaded_s2t import make_nllb_translate_fn

    model, params, cfg = hf_pair
    ckpt = tmp_path / "nllb"
    model.save_pretrained(str(ckpt), safe_serialization=True)

    vocab = [("<unk>", 0.0), ("</s>", 0.0)] + [
        (piece, -3.0 - 0.01 * i)
        for i, piece in enumerate(
            ["▁", "▁ko", "n", "ni", "chi", "wa", "▁he", "llo", "o", "▁w"]
        )
    ]
    oracle = Tokenizer(models.Unigram(vocab, unk_id=0))
    oracle.normalizer = normalizers.NFKC()
    oracle.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always"
    )
    oracle.add_special_tokens(
        [AddedToken("jpn_Jpan", special=True), AddedToken("eng_Latn", special=True)]
    )
    oracle.save(str(ckpt / "tokenizer.json"))

    fn = make_nllb_translate_fn(
        str(ckpt), src_lang="jpn_Jpan", tgt_lang="eng_Latn", max_length=12
    )
    got = fn("konnichiwa")

    # oracle path: same ids through HF generate
    ids = [oracle.token_to_id("jpn_Jpan")] + oracle.encode("konnichiwa").ids + [
        oracle.token_to_id("</s>")
    ]
    width = max(16, (len(ids) + 15) // 16 * 16)
    src = np.full((1, width), cfg.pad_token_id, np.int64)
    src[0, : len(ids)] = ids
    with torch.no_grad():
        out = model.generate(
            input_ids=torch.tensor(src),
            attention_mask=torch.tensor(
                (src != cfg.pad_token_id).astype(np.int64)
            ),
            forced_bos_token_id=oracle.token_to_id("eng_Latn"),
            num_beams=1,
            do_sample=False,
            max_length=12,
        ).numpy()[0]
    pieces = [
        oracle.id_to_token(int(i))
        for i in out
        if oracle.id_to_token(int(i))
        not in ("<unk>", "</s>", "jpn_Jpan", "eng_Latn", None)
    ]
    want = "".join(p for p in pieces if p).replace("▁", " ").strip()
    assert got == want


def test_incremental_decode_matches_full(hf_pair):
    """The cached greedy path must produce the same logits trajectory as
    the full (training) decode on its own output prefix."""
    model, params, cfg = hf_pair
    rng = np.random.default_rng(2)
    src = rng.integers(4, 100, size=(2, 6)).astype(np.int64)
    out = np.asarray(
        ts.generate_greedy_text(
            params, cfg, jnp.asarray(src), forced_bos=5, max_length=10
        )
    )
    # re-score the generated prefix with the full decoder: argmax at each
    # position must reproduce the next token (until eos)
    enc = ts.encode(params, cfg, jnp.asarray(src))
    logits = np.asarray(
        ts.decode(params, cfg, jnp.asarray(out[:, :-1]), enc, jnp.asarray(src))
    )
    nxt = logits.argmax(-1)
    for b in range(out.shape[0]):
        for i in range(1, out.shape[1] - 1):
            if out[b, i + 1] == cfg.pad_token_id:
                break
            if i == 0:
                continue  # forced bos
            assert nxt[b, i] == out[b, i + 1], (b, i)
