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
