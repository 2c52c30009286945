"""Parity check against the reference stack on real weights.

Given a local HF-format Whisper checkpoint (config.json + safetensors +
vocab.json/merges.txt) and an audio file, runs BOTH stacks offline and
compares:

  1. log-mel features (ours vs WhisperFeatureExtractor),
  2. encoder states and first-step logits (ours vs torch forward),
  3. greedy tokens with timestamps (ours vs generate()),

printing per-stage max deviations and token diffs. This is the
"token-for-token vs reference greedy" gate of SURVEY §7.2 packaged as a
tool — zero-egress build environments lack the weights, so it runs
wherever checkpoints exist.

Usage:
  python -m kotoba_whisper_tpu.cli.parity_check \
      --checkpoint /models/whisper-tiny --audio sample.wav --language ja
"""
from __future__ import annotations

import argparse


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--audio", required=True)
    ap.add_argument("--language", default="ja")
    ap.add_argument("--task", default="transcribe")
    ap.add_argument("--max_length", type=int, default=128)
    ap.add_argument("--tokenizer", default=None,
                    help="tokenizer spec (default: the checkpoint dir's "
                    "vocab.json/merges.txt; 'byte' for vocab-free "
                    "rehearsals)")
    arg = ap.parse_args(argv)

    import numpy as np

    from kotoba_whisper_tpu.utils.backend import ensure_backend

    ensure_backend()
    import jax.numpy as jnp
    import torch
    import transformers as trf

    from kotoba_whisper_tpu.cli import common
    from kotoba_whisper_tpu.core.config import FeatureConfig, SpecialTokens
    from kotoba_whisper_tpu.decode.greedy import GenerateOptions, generate_greedy
    from kotoba_whisper_tpu.models import whisper
    from kotoba_whisper_tpu.ops.mel import log_mel_spectrogram, pad_or_trim
    from kotoba_whisper_tpu.utils import native

    with open(arg.audio, "rb") as f:
        audio, _ = native.decode_audio(f.read(), 16000)

    params, cfg = common.load_model(arg.checkpoint)
    tok = common.load_tokenizer(arg.tokenizer or arg.checkpoint)
    st = tok.special
    feat = FeatureConfig(n_mels=cfg.num_mel_bins)

    # --- stage 1: features ---
    hf_fe = trf.WhisperFeatureExtractor(feature_size=cfg.num_mel_bins)
    golden_mel = hf_fe(audio, sampling_rate=16000, return_tensors="np")[
        "input_features"
    ]
    ours_mel = np.asarray(
        log_mel_spectrogram(
            jnp.asarray(pad_or_trim(audio[None], feat.n_samples)), feat
        )
    )
    print(f"[mel] max|Δ| = {np.abs(ours_mel - golden_mel).max():.2e}")

    # --- stage 2: forward logits ---
    hf_model = trf.WhisperForConditionalGeneration.from_pretrained(
        arg.checkpoint
    ).eval()
    prompt = tok.sot_sequence(arg.language, arg.task)
    with torch.no_grad():
        enc_hf = hf_model.model.encoder(
            torch.from_numpy(golden_mel)
        ).last_hidden_state.numpy()
        logits_hf = hf_model(
            input_features=torch.from_numpy(golden_mel),
            decoder_input_ids=torch.tensor([prompt]),
        ).logits.numpy()
    enc_ours = np.asarray(whisper.encode(params, cfg, jnp.asarray(golden_mel)))
    logits_ours, _ = whisper.forward(
        params, cfg, jnp.asarray(golden_mel), jnp.asarray([prompt], jnp.int32)
    )
    print(f"[encoder] max|Δ| = {np.abs(enc_ours - enc_hf).max():.2e}")
    print(f"[logits]  max|Δ| = {np.abs(np.asarray(logits_ours) - logits_hf).max():.2e}")

    # --- stage 3: greedy tokens ---
    gen_defaults = common.load_generation_defaults(arg.checkpoint)
    opts = GenerateOptions(
        prompt_ids=tuple(prompt), max_length=arg.max_length, **gen_defaults
    )
    ours_tokens = np.asarray(
        generate_greedy(params, cfg, jnp.asarray(ours_mel), opts, st)
    )[0].tolist()
    if st.eot in ours_tokens:
        ours_tokens = ours_tokens[: ours_tokens.index(st.eot) + 1]
    with torch.no_grad():
        hf_tokens = hf_model.generate(
            torch.from_numpy(golden_mel),
            language=arg.language,
            task=arg.task,
            return_timestamps=True,
            max_length=arg.max_length,
            num_beams=1,
            do_sample=False,
        )[0].tolist()
    ours_gen = ours_tokens[len(prompt):]
    hf_gen = [t for t in hf_tokens if t not in prompt][: len(ours_gen)] \
        if hf_tokens[: len(prompt)] == list(prompt) else hf_tokens
    match = ours_gen == hf_gen[: len(ours_gen)]
    print(f"[greedy] ours: {tok.decode(ours_tokens, decode_with_timestamps=True)!r}")
    print(f"[greedy] token-exact match: {match}")
    if not match:
        print(f"  ours ids: {ours_gen[:40]}")
        print(f"  hf   ids: {hf_gen[:40]}")
    raise SystemExit(0 if match else 1)


if __name__ == "__main__":
    main()
