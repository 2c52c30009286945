"""HF Whisper checkpoint import/export.

Lets `openai/whisper-large-v3`-format weights (config.json + *.safetensors or
a torch state_dict) load into our pytree layout, and exports back, so the
reference's artifact format (save_pretrained at run_distillation.py:511-514,
create_student_model.py:134-137) round-trips. Only the tensor name mapping is
implemented here — the model math lives in models/whisper.py.

Name mapping (HF -> ours):
  model.encoder.conv{1,2}.{weight,bias}        -> encoder.conv{1,2}  (W: (out,in,k)->(k,in,out))
  model.encoder.embed_positions.weight          -> encoder.pos_embedding
  model.{en,de}coder.layers.N.<sub>.{weight,bias} -> stacked on axis 0
  model.decoder.embed_tokens.weight             -> decoder.embed_tokens.embedding
  model.decoder.embed_positions.weight          -> decoder.pos_embedding
  model.{en,de}coder.layer_norm.{weight,bias}   -> {en,de}coder.layer_norm
  proj_out.weight                               -- tied; ignored on import
"""
from __future__ import annotations

import json
import os
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from kotoba_whisper_tpu.core.config import WhisperConfig

_ATTN_SUBS = {
    "q_proj": True,  # name -> has bias
    "k_proj": False,
    "v_proj": True,
    "out_proj": True,
}


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _dense_from(sd, prefix, bias=True):
    p = {"kernel": _to_np(sd[f"{prefix}.weight"]).T}
    if bias:
        p["bias"] = _to_np(sd[f"{prefix}.bias"])
    return p


def _ln_from(sd, prefix):
    return {
        "scale": _to_np(sd[f"{prefix}.weight"]),
        "bias": _to_np(sd[f"{prefix}.bias"]),
    }


def _attn_from(sd, prefix):
    return {
        name: _dense_from(sd, f"{prefix}.{name}", bias=has_bias)
        for name, has_bias in _ATTN_SUBS.items()
    }


def _stack(layers: list[Any]):
    return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *layers)


def params_from_hf_state_dict(
    sd: Mapping[str, Any], cfg: WhisperConfig
) -> Any:
    """Torch/safetensors flat state dict -> our stacked pytree (fp32)."""
    enc_layers = []
    for i in range(cfg.encoder_layers):
        p = f"model.encoder.layers.{i}"
        enc_layers.append(
            {
                "self_attn": _attn_from(sd, f"{p}.self_attn"),
                "self_attn_layer_norm": _ln_from(sd, f"{p}.self_attn_layer_norm"),
                "fc1": _dense_from(sd, f"{p}.fc1"),
                "fc2": _dense_from(sd, f"{p}.fc2"),
                "final_layer_norm": _ln_from(sd, f"{p}.final_layer_norm"),
            }
        )
    dec_layers = []
    for i in range(cfg.decoder_layers):
        p = f"model.decoder.layers.{i}"
        dec_layers.append(
            {
                "self_attn": _attn_from(sd, f"{p}.self_attn"),
                "self_attn_layer_norm": _ln_from(sd, f"{p}.self_attn_layer_norm"),
                "encoder_attn": _attn_from(sd, f"{p}.encoder_attn"),
                "encoder_attn_layer_norm": _ln_from(
                    sd, f"{p}.encoder_attn_layer_norm"
                ),
                "fc1": _dense_from(sd, f"{p}.fc1"),
                "fc2": _dense_from(sd, f"{p}.fc2"),
                "final_layer_norm": _ln_from(sd, f"{p}.final_layer_norm"),
            }
        )

    encoder = {
        "conv1": {
            "kernel": jnp.asarray(
                _to_np(sd["model.encoder.conv1.weight"]).transpose(2, 1, 0)
            ),
            "bias": jnp.asarray(_to_np(sd["model.encoder.conv1.bias"])),
        },
        "conv2": {
            "kernel": jnp.asarray(
                _to_np(sd["model.encoder.conv2.weight"]).transpose(2, 1, 0)
            ),
            "bias": jnp.asarray(_to_np(sd["model.encoder.conv2.bias"])),
        },
        "pos_embedding": jnp.asarray(
            _to_np(sd["model.encoder.embed_positions.weight"])
        ),
        "layers": _stack(enc_layers),
        "layer_norm": _ln_from(sd, "model.encoder.layer_norm"),
    }
    decoder = {
        "embed_tokens": {
            "embedding": jnp.asarray(_to_np(sd["model.decoder.embed_tokens.weight"]))
        },
        "pos_embedding": jnp.asarray(
            _to_np(sd["model.decoder.embed_positions.weight"])
        ),
        "layers": _stack(dec_layers),
        "layer_norm": _ln_from(sd, "model.decoder.layer_norm"),
    }
    params = {"encoder": encoder, "decoder": decoder}
    return jax.tree.map(jnp.asarray, params)


def config_from_hf_dict(d: Mapping[str, Any]) -> WhisperConfig:
    return WhisperConfig(
        vocab_size=d["vocab_size"],
        num_mel_bins=d["num_mel_bins"],
        d_model=d["d_model"],
        encoder_layers=d["encoder_layers"],
        encoder_attention_heads=d["encoder_attention_heads"],
        decoder_layers=d["decoder_layers"],
        decoder_attention_heads=d["decoder_attention_heads"],
        encoder_ffn_dim=d["encoder_ffn_dim"],
        decoder_ffn_dim=d["decoder_ffn_dim"],
        max_source_positions=d["max_source_positions"],
        max_target_positions=d["max_target_positions"],
        pad_token_id=d.get("pad_token_id", 50256),
        bos_token_id=d.get("bos_token_id", 50257),
        eos_token_id=d.get("eos_token_id", 50257),
        decoder_start_token_id=d.get("decoder_start_token_id", 50258),
    )


def load_hf_checkpoint(path: str) -> tuple[Any, WhisperConfig]:
    """Load a local HF-format dir (config.json + model.safetensors)."""
    with open(os.path.join(path, "config.json")) as f:
        cfg = config_from_hf_dict(json.load(f))
    sd = {}
    st_files = [
        f for f in os.listdir(path) if f.endswith(".safetensors")
    ]
    if st_files:
        from safetensors import safe_open

        for fname in st_files:
            with safe_open(os.path.join(path, fname), framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
    else:
        import torch

        bin_path = os.path.join(path, "pytorch_model.bin")
        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
    return params_from_hf_state_dict(sd, cfg), cfg


# ---------------------------------------------------------------------------
# Export (our pytree -> HF flat dict) — used by the student trainer's
# save path so distilled checkpoints are consumable by the HF ecosystem.
# ---------------------------------------------------------------------------

def hf_state_dict_from_params(params: Any, cfg: WhisperConfig) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}

    def put_dense(prefix, p, i=None):
        kernel = np.asarray(p["kernel"] if i is None else p["kernel"][i])
        # contiguous copy: safetensors writes the raw buffer, so a
        # transposed view would serialize in the wrong layout
        out[f"{prefix}.weight"] = np.ascontiguousarray(kernel.T)
        if "bias" in p:
            out[f"{prefix}.bias"] = np.asarray(
                p["bias"] if i is None else p["bias"][i]
            )

    def put_ln(prefix, p, i=None):
        out[f"{prefix}.weight"] = np.asarray(p["scale"] if i is None else p["scale"][i])
        out[f"{prefix}.bias"] = np.asarray(p["bias"] if i is None else p["bias"][i])

    def put_attn(prefix, p, i=None):
        for name in _ATTN_SUBS:
            put_dense(f"{prefix}.{name}", p[name], i)

    enc, dec = params["encoder"], params["decoder"]
    out["model.encoder.conv1.weight"] = np.ascontiguousarray(
        np.asarray(enc["conv1"]["kernel"]).transpose(2, 1, 0)
    )
    out["model.encoder.conv1.bias"] = np.asarray(enc["conv1"]["bias"])
    out["model.encoder.conv2.weight"] = np.ascontiguousarray(
        np.asarray(enc["conv2"]["kernel"]).transpose(2, 1, 0)
    )
    out["model.encoder.conv2.bias"] = np.asarray(enc["conv2"]["bias"])
    out["model.encoder.embed_positions.weight"] = np.asarray(enc["pos_embedding"])
    for i in range(cfg.encoder_layers):
        p = f"model.encoder.layers.{i}"
        put_attn(f"{p}.self_attn", enc["layers"]["self_attn"], i)
        put_ln(f"{p}.self_attn_layer_norm", enc["layers"]["self_attn_layer_norm"], i)
        put_dense(f"{p}.fc1", enc["layers"]["fc1"], i)
        put_dense(f"{p}.fc2", enc["layers"]["fc2"], i)
        put_ln(f"{p}.final_layer_norm", enc["layers"]["final_layer_norm"], i)
    put_ln("model.encoder.layer_norm", enc["layer_norm"])

    out["model.decoder.embed_tokens.weight"] = np.asarray(
        dec["embed_tokens"]["embedding"]
    )
    out["model.decoder.embed_positions.weight"] = np.asarray(dec["pos_embedding"])
    for i in range(cfg.decoder_layers):
        p = f"model.decoder.layers.{i}"
        put_attn(f"{p}.self_attn", dec["layers"]["self_attn"], i)
        put_ln(f"{p}.self_attn_layer_norm", dec["layers"]["self_attn_layer_norm"], i)
        put_attn(f"{p}.encoder_attn", dec["layers"]["encoder_attn"], i)
        put_ln(
            f"{p}.encoder_attn_layer_norm",
            dec["layers"]["encoder_attn_layer_norm"],
            i,
        )
        put_dense(f"{p}.fc1", dec["layers"]["fc1"], i)
        put_dense(f"{p}.fc2", dec["layers"]["fc2"], i)
        put_ln(f"{p}.final_layer_norm", dec["layers"]["final_layer_norm"], i)
    put_ln("model.decoder.layer_norm", dec["layer_norm"])
    out["proj_out.weight"] = out["model.decoder.embed_tokens.weight"]
    return out
