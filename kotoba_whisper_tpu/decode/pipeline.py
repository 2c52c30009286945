"""ASR pipeline factory: audio in, text (+ timestamped chunks) out.

Equivalent of HF `pipeline("automatic-speech-recognition",
chunk_length_s=15, batch_size=N)` as invoked at run_short_form_eval.py:
110-117 — composes the on-device mel frontend, greedy/beam decode, and the
long-form chunk merge into a single callable.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from kotoba_whisper_tpu.core.config import FeatureConfig, WhisperConfig
from kotoba_whisper_tpu.decode.greedy import GenerateOptions
from kotoba_whisper_tpu.decode.longform import (
    ChunkingConfig,
    transcribe_long_form,
)
from kotoba_whisper_tpu.tokenizer.whisper_tokenizer import WhisperTokenizer


@dataclass
class AsrPipeline:
    params: object
    cfg: WhisperConfig
    tok: WhisperTokenizer
    language: str = "ja"
    task: str = "transcribe"
    chunk_length_s: float = 15.0
    num_beams: int = 1
    max_length: int = 128
    return_timestamps: bool = True
    compute_dtype: object = None
    attn_impl: str = "xla"
    suppress_tokens: tuple = ()
    begin_suppress_tokens: tuple = ()
    max_initial_timestamp_index: int = 50
    kv_dtype: str = "compute"
    # "int16": ship 16-bit PCM over the host->device link and normalize
    # on device (ops/mel.py) — halves the audio upload, which measures as
    # ~40% of the 300 s serving latency on a remote-attached chip
    # (tools/speed_decomp.py). Bit-identical to fp32 for PCM-sourced
    # audio (native/audio.cpp emits pcm/32768); synthetic float inputs
    # are quantized to the nearest PCM step.
    wire_dtype: str = "float32"

    def __post_init__(self):
        import jax.numpy as jnp

        if self.compute_dtype is None:
            self.compute_dtype = jnp.float32
        self.feat = FeatureConfig(n_mels=self.cfg.num_mel_bins)
        self.chunking = ChunkingConfig(chunk_length_s=self.chunk_length_s)
        self.opts = GenerateOptions(
            prompt_ids=tuple(
                self.tok.sot_sequence(
                    self.language, self.task, timestamps=self.return_timestamps
                )
            ),
            max_length=self.max_length,
            return_timestamps=self.return_timestamps,
            suppress_tokens=tuple(self.suppress_tokens),
            begin_suppress_tokens=tuple(self.begin_suppress_tokens),
            max_initial_timestamp_index=self.max_initial_timestamp_index,
        )

    def _generate(self, batch_audio: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        from kotoba_whisper_tpu.data.collator import CollatorConfig, collate_audio
        from kotoba_whisper_tpu.decode.beam import generate_beam
        from kotoba_whisper_tpu.decode.greedy import generate_greedy
        from kotoba_whisper_tpu.ops.mel import log_mel_spectrogram

        # pad each 15 s chunk to the model's 30 s context
        audio = collate_audio(
            list(batch_audio), CollatorConfig(n_samples=self.feat.n_samples)
        )
        if self.wire_dtype == "int16":
            audio = np.clip(
                np.round(audio * 32768.0), -32768, 32767
            ).astype(np.int16)
        mel = log_mel_spectrogram(jnp.asarray(audio), self.feat).astype(
            self.compute_dtype
        )
        if self.num_beams > 1:
            out, _ = generate_beam(
                self.params, self.cfg, mel, self.opts, self.tok.special,
                num_beams=self.num_beams, compute_dtype=self.compute_dtype,
                attn_impl=self.attn_impl, kv_dtype=self.kv_dtype,
            )
        else:
            out = generate_greedy(
                self.params, self.cfg, mel, self.opts, self.tok.special,
                compute_dtype=self.compute_dtype, attn_impl=self.attn_impl,
                kv_dtype=self.kv_dtype,
            )
        return np.asarray(out)

    def __call__(self, audio: np.ndarray) -> dict:
        return transcribe_long_form(
            audio, self.tok, self._generate, self.chunking,
            return_timestamps=self.return_timestamps,
        )

    def transcribe(self, audio: np.ndarray) -> str:
        return self(audio)["text"]
