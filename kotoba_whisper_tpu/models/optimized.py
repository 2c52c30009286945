"""Inference-time parameter transforms.

`fuse_for_inference` rewrites attention projections into fused forms so the
decode hot loop issues fewer, larger matmuls (the decoder is weight-
streaming bound at batch sizes used for pseudo-labelling):

  - self-attention q/k/v -> one (d, 3d) qkv projection,
  - cross-attention k/v -> one (d, 2d) kv projection (consumed once per
    utterance when the cache is built).

models/whisper.py's `mha`/`init_cache`/`decode` detect the fused entries and
use them; the transform is lossless (pure concatenation) and reversible.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _fuse(p: dict, names: list[str], out_name: str) -> dict:
    parts = [p[n] for n in names]
    fused: dict = {
        "kernel": jnp.concatenate([q["kernel"] for q in parts], axis=-1)
    }
    if all("bias" in q for q in parts):
        fused["bias"] = jnp.concatenate([q["bias"] for q in parts], axis=-1)
    else:
        # k_proj has no bias in Whisper: pad its slot with zeros so the
        # fused projection keeps one bias add
        biases = [
            q.get(
                "bias",
                jnp.zeros(
                    q["kernel"].shape[:-2] + q["kernel"].shape[-1:],
                    q["kernel"].dtype,
                ),
            )
            for q in parts
        ]
        fused["bias"] = jnp.concatenate(biases, axis=-1)
    out = {k: v for k, v in p.items() if k not in names}
    out[out_name] = fused
    return out


def fuse_attention(attn: dict, *, cross: bool) -> dict:
    if cross:
        return _fuse(attn, ["k_proj", "v_proj"], "kv_proj")
    return _fuse(attn, ["q_proj", "k_proj", "v_proj"], "qkv_proj")


def fuse_for_inference(params: Any) -> Any:
    out = {"encoder": dict(params["encoder"]), "decoder": dict(params["decoder"])}
    enc_layers = dict(params["encoder"]["layers"])
    enc_layers["self_attn"] = fuse_attention(enc_layers["self_attn"], cross=False)
    out["encoder"]["layers"] = enc_layers
    dec_layers = dict(params["decoder"]["layers"])
    dec_layers["self_attn"] = fuse_attention(dec_layers["self_attn"], cross=False)
    dec_layers["encoder_attn"] = fuse_attention(
        dec_layers["encoder_attn"], cross=True
    )
    out["decoder"]["layers"] = dec_layers
    return out
