"""Cascaded speech-to-text translation pipeline.

Counterpart of misc/cascaded_s2t_translation/{ja,en}_cascaded_s2t_translation.py:
ASR on the source language, then text translation in postprocess (:21-48).
The reference binds NLLB through HF; here the translator is a pluggable
callable so any JAX/native MT model (or an identity passthrough for
ASR-only) composes with the ASR pipeline.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

from kotoba_whisper_tpu.decode.pipeline import AsrPipeline


@dataclass
class CascadedS2TPipeline:
    """transcribe(source lang) -> translate(text) — e.g. ja audio -> en text."""

    asr: AsrPipeline
    translate_fn: Callable[[str], str]
    source_lang: str = "ja"
    target_lang: str = "en"

    def __call__(self, audio: np.ndarray) -> dict:
        asr_out = self.asr(audio)
        translation = self.translate_fn(asr_out["text"])
        return {
            "text": translation,
            "source_text": asr_out["text"],
            "chunks": asr_out["chunks"],
            "source_lang": self.source_lang,
            "target_lang": self.target_lang,
        }

    def transcribe(self, audio: np.ndarray) -> str:
        return self(audio)["text"]


def make_nllb_translate_fn(
    checkpoint_dir: str,
    src_lang: str = "jpn_Jpan",
    tgt_lang: str = "eng_Latn",
    *,
    max_length: int = 128,
    compute_dtype=None,
):
    """Real MT translator from an NLLB/M2M100 HF checkpoint dir
    (config.json + model.safetensors + tokenizer.json) — the model the
    reference binds through HF (ja_cascaded_s2t_translation.py:45-48),
    loaded into the native stack (models/text_seq2seq.py greedy decode +
    tokenizer/unigram.py)."""
    import jax.numpy as jnp

    from kotoba_whisper_tpu.models import text_seq2seq as ts
    from kotoba_whisper_tpu.tokenizer.unigram import NllbTokenizer

    params, cfg = ts.load_hf_checkpoint(checkpoint_dir)
    tok = NllbTokenizer.from_pretrained_dir(checkpoint_dir)
    dtype = compute_dtype or jnp.float32

    def translate(text: str) -> str:
        ids = tok.encode(text, src_lang)
        # bucket the source length so repeated calls reuse compilations
        width = max(16, (len(ids) + 15) // 16 * 16)
        src = np.full((1, width), cfg.pad_token_id, np.int32)
        src[0, : len(ids)] = ids
        out = ts.generate_greedy_text(
            params, cfg, jnp.asarray(src),
            forced_bos=tok.lang_id(tgt_lang),
            max_length=max_length, compute_dtype=dtype,
        )
        return tok.decode(np.asarray(out)[0])

    return translate
