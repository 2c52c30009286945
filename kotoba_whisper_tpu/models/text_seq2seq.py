"""M2M100/NLLB-architecture text seq2seq model (JAX, scan-stacked pytree).

The reference's cascaded speech-to-text translation binds an NLLB-200
machine-translation model through HF transformers
(/root/reference/misc/cascaded_s2t_translation/ja_cascaded_s2t_translation.py:45-48,
push_pipeline.py:12-42). This module implements that model family natively
so `eval/cascaded_s2t.py` composes a REAL translator on the TPU stack:
pre-LN transformer encoder-decoder with sinusoidal positions (fairseq
offset-2, padding-aware), scaled shared embeddings, relu MLPs, and a tied
lm_head — the M2M100 architecture NLLB-200 checkpoints use. Weights load
from an HF checkpoint dir via `load_hf_checkpoint` (config.json +
safetensors), mirroring models/hf_import.py for Whisper.

Parity: forward logits and greedy decode are golden-tested against
transformers' M2M100ForConditionalGeneration on random tiny configs
(tests/test_text_seq2seq.py), the same offline-HF oracle strategy as the
Whisper model (docs/PARITY.md).

Design notes (TPU-first, same conventions as models/whisper.py):
  - per-layer params are STACKED on axis 0 and the layer loop is a
    lax.scan — one compiled block regardless of depth;
  - decode is a fixed-capacity KV cache + lax.while_loop greedy with
    static shapes; MT decode is not a throughput hot path for the
    pipeline, so the cache keeps the simple per-head layout (the flat
    lane-packed layout + ring streaming of the Whisper decoder is
    deliberately not duplicated here);
  - positions follow create_position_ids_from_input_ids exactly:
    pos = (cumsum(mask) + past) * mask + padding_idx, table offset 2.
"""
from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from kotoba_whisper_tpu.models.whisper import (
    dense,
    layer_norm,
    merge_heads,
    split_heads,
)
from kotoba_whisper_tpu.ops.attention import attention_xla

Params = Any


@dataclass(frozen=True)
class TextSeq2SeqConfig:
    vocab_size: int = 128112
    d_model: int = 1024
    encoder_layers: int = 12
    decoder_layers: int = 12
    encoder_attention_heads: int = 16
    decoder_attention_heads: int = 16
    encoder_ffn_dim: int = 4096
    decoder_ffn_dim: int = 4096
    max_position_embeddings: int = 1024
    pad_token_id: int = 1
    eos_token_id: int = 2
    decoder_start_token_id: int = 2
    scale_embedding: bool = True
    layer_norm_eps: float = 1e-5

    @property
    def embed_scale(self) -> float:
        return math.sqrt(self.d_model) if self.scale_embedding else 1.0


def config_from_hf_dict(d) -> TextSeq2SeqConfig:
    """From an M2M100/NLLB config.json dict."""
    return TextSeq2SeqConfig(
        vocab_size=d["vocab_size"],
        d_model=d["d_model"],
        encoder_layers=d["encoder_layers"],
        decoder_layers=d["decoder_layers"],
        encoder_attention_heads=d["encoder_attention_heads"],
        decoder_attention_heads=d["decoder_attention_heads"],
        encoder_ffn_dim=d["encoder_ffn_dim"],
        decoder_ffn_dim=d["decoder_ffn_dim"],
        max_position_embeddings=d.get("max_position_embeddings", 1024),
        pad_token_id=d.get("pad_token_id", 1),
        eos_token_id=d.get("eos_token_id", 2),
        decoder_start_token_id=d.get("decoder_start_token_id", 2),
        scale_embedding=d.get("scale_embedding", True),
    )


# ---------------------------------------------------------------------------
# sinusoidal positions (fairseq/tensor2tensor layout, offset 2)
# ---------------------------------------------------------------------------

def sinusoidal_table(
    num_positions: int, d: int, padding_idx: int | None = 1
) -> np.ndarray:
    """M2M100SinusoidalPositionalEmbedding.get_embedding: [sin | cos]
    concatenated (NOT interleaved), row padding_idx zeroed, offset rows
    included (table covers positions 0..num_positions+1)."""
    n = num_positions + 2  # offset
    half = d // 2
    freq = np.exp(np.arange(half, dtype=np.float64) * -(math.log(10000) / (half - 1)))
    ang = np.arange(n, dtype=np.float64)[:, None] * freq[None, :]
    emb = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if d % 2 == 1:
        emb = np.concatenate([emb, np.zeros((n, 1))], axis=1)
    if padding_idx is not None:
        emb[padding_idx] = 0.0
    return emb.astype(np.float32)


def position_ids(input_ids, pad_id: int, past: int = 0):
    """create_position_ids_from_input_ids semantics."""
    mask = (input_ids != pad_id).astype(jnp.int32)
    return (jnp.cumsum(mask, axis=1) + past) * mask + pad_id


# ---------------------------------------------------------------------------
# init (random params for tests/tools)
# ---------------------------------------------------------------------------

def _init_dense(key, d_in, d_out, n_layers):
    k1, _ = jax.random.split(key)
    return {
        "kernel": jax.random.normal(k1, (n_layers, d_in, d_out), jnp.float32)
        * (0.02 if d_in > 4 else 0.1),
        "bias": jnp.zeros((n_layers, d_out), jnp.float32),
    }


def _init_attn(key, d, n_layers):
    ks = jax.random.split(key, 4)
    return {
        name: _init_dense(k, d, d, n_layers)
        for name, k in zip(("q_proj", "k_proj", "v_proj", "out_proj"), ks)
    }


def _init_ln(d, n_layers):
    return {
        "scale": jnp.ones((n_layers, d), jnp.float32),
        "bias": jnp.zeros((n_layers, d), jnp.float32),
    }


def init_params(key, cfg: TextSeq2SeqConfig) -> Params:
    keys = jax.random.split(key, 8)
    d = cfg.d_model

    def stack_side(k, n_layers, ffn, cross):
        sub = {
            "self_attn": _init_attn(jax.random.fold_in(k, 0), d, n_layers),
            "self_attn_layer_norm": _init_ln(d, n_layers),
            "fc1": _init_dense(jax.random.fold_in(k, 1), d, ffn, n_layers),
            "fc2": _init_dense(jax.random.fold_in(k, 2), ffn, d, n_layers),
            "final_layer_norm": _init_ln(d, n_layers),
        }
        if cross:
            sub["encoder_attn"] = _init_attn(jax.random.fold_in(k, 3), d, n_layers)
            sub["encoder_attn_layer_norm"] = _init_ln(d, n_layers)
        return sub

    shared = jax.random.normal(keys[0], (cfg.vocab_size, d), jnp.float32) * 0.02
    pos = jnp.asarray(
        sinusoidal_table(cfg.max_position_embeddings, d, cfg.pad_token_id)
    )
    return {
        "shared": {"embedding": shared},
        "pos_table": pos,
        "encoder": {
            "layers": stack_side(keys[1], cfg.encoder_layers, cfg.encoder_ffn_dim, False),
            "layer_norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        },
        "decoder": {
            "layers": stack_side(keys[2], cfg.decoder_layers, cfg.decoder_ffn_dim, True),
            "layer_norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        },
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _mha(p, x, kv_x, n_heads, *, mask=None, causal=False):
    q = dense(p["q_proj"], x)
    k = dense(p["k_proj"], kv_x)
    v = dense(p["v_proj"], kv_x)
    o = attention_xla(
        split_heads(q, n_heads), split_heads(k, n_heads),
        split_heads(v, n_heads), mask, causal=causal,
    )
    return dense(p["out_proj"], merge_heads(o))


def _embed(params, cfg, ids, past=0, compute_dtype=jnp.float32):
    tok = params["shared"]["embedding"].astype(compute_dtype)[ids]
    tok = tok * jnp.asarray(cfg.embed_scale, compute_dtype)
    pos = position_ids(ids, cfg.pad_token_id, past)
    return tok + jnp.take(
        params["pos_table"].astype(compute_dtype), pos, axis=0
    )


def encode(
    params: Params,
    cfg: TextSeq2SeqConfig,
    input_ids: jax.Array,            # (B, T) right-padded with pad_token_id
    *,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """(B, T) -> (B, T, d). Key-padding handled inside; padded positions'
    outputs are garbage and must stay masked by the caller (HF behavior)."""
    x = _embed(params, cfg, input_ids, compute_dtype=compute_dtype)
    key_mask = (input_ids != cfg.pad_token_id)[:, None, None, :]  # (B,1,1,T)
    n_heads = cfg.encoder_attention_heads
    eps = cfg.layer_norm_eps

    def block(x, lp):
        h = layer_norm(lp["self_attn_layer_norm"], x, eps)
        x = x + _mha(lp["self_attn"], h, h, n_heads, mask=key_mask)
        h = layer_norm(lp["final_layer_norm"], x, eps)
        h = jax.nn.relu(dense(lp["fc1"], h))
        x = x + dense(lp["fc2"], h)
        return x, None

    x, _ = jax.lax.scan(block, x, params["encoder"]["layers"])
    return layer_norm(params["encoder"]["layer_norm"], x, eps)


def decode(
    params: Params,
    cfg: TextSeq2SeqConfig,
    decoder_input_ids: jax.Array,    # (B, T)
    encoder_out: jax.Array,          # (B, S, d)
    encoder_ids: jax.Array,          # (B, S) for the cross key-padding mask
    *,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Full (training/parity) decoder pass -> logits (B, T, vocab)."""
    x = _embed(params, cfg, decoder_input_ids, compute_dtype=compute_dtype)
    cross_mask = (encoder_ids != cfg.pad_token_id)[:, None, None, :]
    enc = encoder_out.astype(compute_dtype)
    n_heads = cfg.decoder_attention_heads
    eps = cfg.layer_norm_eps

    def block(x, lp):
        h = layer_norm(lp["self_attn_layer_norm"], x, eps)
        x = x + _mha(lp["self_attn"], h, h, n_heads, causal=True)
        h = layer_norm(lp["encoder_attn_layer_norm"], x, eps)
        x = x + _mha(lp["encoder_attn"], h, enc, n_heads, mask=cross_mask)
        h = layer_norm(lp["final_layer_norm"], x, eps)
        h = jax.nn.relu(dense(lp["fc1"], h))
        x = x + dense(lp["fc2"], h)
        return x, None

    x, _ = jax.lax.scan(block, x, params["decoder"]["layers"])
    x = layer_norm(params["decoder"]["layer_norm"], x, eps)
    return jnp.einsum(
        "btd,vd->btv", x, params["shared"]["embedding"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# incremental greedy decode
# ---------------------------------------------------------------------------

class TextKVCache(NamedTuple):
    self_k: jax.Array   # (L, B, cap, d)
    self_v: jax.Array
    cross_k: jax.Array  # (L, B, S, d)
    cross_v: jax.Array
    length: jax.Array   # () int32


def _init_cache(params, cfg, encoder_out, capacity, compute_dtype):
    enc = encoder_out.astype(compute_dtype)

    def cross_kv(lp):
        ea = lp["encoder_attn"]
        return dense(ea["k_proj"], enc), dense(ea["v_proj"], enc)

    ck, cv = jax.vmap(cross_kv)(params["decoder"]["layers"])
    l, b = cfg.decoder_layers, encoder_out.shape[0]
    zeros = jnp.zeros((l, b, capacity, cfg.d_model), compute_dtype)
    return TextKVCache(zeros, zeros, ck, cv, jnp.zeros((), jnp.int32))


def _decode_step(params, cfg, token, cache, cross_mask, compute_dtype):
    """One token (B, 1) -> (logits (B, vocab), cache)."""
    n_heads = cfg.decoder_attention_heads
    eps = cfg.layer_norm_eps
    cap = cache.self_k.shape[2]
    x = _embed(params, cfg, token, past=cache.length, compute_dtype=compute_dtype)
    self_mask = (
        jnp.arange(cap)[None, None, None, :] <= cache.length
    )  # slots 0..length inclusive (the one just written)

    def block(x, layer_in):
        lp, sk, sv, ck, cv = layer_in
        h = layer_norm(lp["self_attn_layer_norm"], x, eps)
        k_new = dense(lp["self_attn"]["k_proj"], h)
        v_new = dense(lp["self_attn"]["v_proj"], h)
        sk = jax.lax.dynamic_update_slice_in_dim(sk, k_new, cache.length, axis=1)
        sv = jax.lax.dynamic_update_slice_in_dim(sv, v_new, cache.length, axis=1)
        q = dense(lp["self_attn"]["q_proj"], h)
        o = attention_xla(
            split_heads(q, n_heads), split_heads(sk, n_heads),
            split_heads(sv, n_heads), self_mask,
        )
        x = x + dense(lp["self_attn"]["out_proj"], merge_heads(o))
        h = layer_norm(lp["encoder_attn_layer_norm"], x, eps)
        q = dense(lp["encoder_attn"]["q_proj"], h)
        o = attention_xla(
            split_heads(q, n_heads), split_heads(ck, n_heads),
            split_heads(cv, n_heads), cross_mask,
        )
        x = x + dense(lp["encoder_attn"]["out_proj"], merge_heads(o))
        h = layer_norm(lp["final_layer_norm"], x, eps)
        h = jax.nn.relu(dense(lp["fc1"], h))
        x = x + dense(lp["fc2"], h)
        return x, (sk, sv)

    scan_in = (
        params["decoder"]["layers"], cache.self_k, cache.self_v,
        cache.cross_k, cache.cross_v,
    )
    x, (nk, nv) = jax.lax.scan(block, x, scan_in)
    x = layer_norm(params["decoder"]["layer_norm"], x, eps)
    logits = jnp.einsum(
        "btd,vd->btv", x, params["shared"]["embedding"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    )[:, 0]
    return logits, TextKVCache(nk, nv, cache.cross_k, cache.cross_v,
                               cache.length + 1)


@partial(
    jax.jit,
    static_argnames=("cfg", "max_length", "forced_bos", "compute_dtype"),
)
def generate_greedy_text(
    params: Params,
    cfg: TextSeq2SeqConfig,
    input_ids: jax.Array,            # (B, S) right-padded source
    *,
    forced_bos: int,                 # target language code token
    max_length: int = 64,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """HF generate() semantics for M2M100: sequence starts
    [decoder_start(=eos), forced_bos, ...], greedy argmax, stop at eos,
    pad after. Returns (B, max_length)."""
    b = input_ids.shape[0]
    enc = encode(params, cfg, input_ids, compute_dtype=compute_dtype)
    cross_mask = (input_ids != cfg.pad_token_id)[:, None, None, :]
    cache = _init_cache(params, cfg, enc, max_length, compute_dtype)

    tokens = jnp.full((b, max_length), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(cfg.decoder_start_token_id)
    tokens = tokens.at[:, 1].set(forced_bos)
    finished = jnp.zeros((b,), bool)

    def cond(carry):
        i, _, finished, _ = carry
        return (i < max_length - 1) & ~jnp.all(finished)

    def body(carry):
        i, tokens, finished, cache = carry
        tok = jax.lax.dynamic_slice_in_dim(tokens, i, 1, axis=1)
        logits, cache = _decode_step(
            params, cfg, tok, cache, cross_mask, compute_dtype
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(i + 1 == 1, jnp.full_like(nxt, forced_bos), nxt)
        nxt = jnp.where(finished, cfg.pad_token_id, nxt)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, nxt[:, None], i + 1, axis=1
        )
        finished = finished | (nxt == cfg.eos_token_id)
        return i + 1, tokens, finished, cache

    _, tokens, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), tokens, finished, cache)
    )
    return tokens


# ---------------------------------------------------------------------------
# HF checkpoint import
# ---------------------------------------------------------------------------

def params_from_hf_state_dict(sd, cfg: TextSeq2SeqConfig) -> Params:
    """M2M100ForConditionalGeneration state dict -> our pytree. Accepts
    keys with or without the leading 'model.'; lm_head is tied to the
    shared embedding and ignored."""

    def g(name):
        if name in sd:
            t = sd[name]
        elif f"model.{name}" in sd:
            t = sd[f"model.{name}"]
        else:
            raise KeyError(name)
        if hasattr(t, "detach"):
            t = t.detach().cpu().float().numpy()
        return np.asarray(t, np.float32)

    def dense_p(prefix):
        return {"kernel": g(f"{prefix}.weight").T, "bias": g(f"{prefix}.bias")}

    def ln_p(prefix):
        return {"scale": g(f"{prefix}.weight"), "bias": g(f"{prefix}.bias")}

    def attn_p(prefix):
        return {
            n: dense_p(f"{prefix}.{n}")
            for n in ("q_proj", "k_proj", "v_proj", "out_proj")
        }

    def stack(side, n_layers, cross):
        layers = []
        for i in range(n_layers):
            pre = f"{side}.layers.{i}"
            lp = {
                "self_attn": attn_p(f"{pre}.self_attn"),
                "self_attn_layer_norm": ln_p(f"{pre}.self_attn_layer_norm"),
                "fc1": dense_p(f"{pre}.fc1"),
                "fc2": dense_p(f"{pre}.fc2"),
                "final_layer_norm": ln_p(f"{pre}.final_layer_norm"),
            }
            if cross:
                lp["encoder_attn"] = attn_p(f"{pre}.encoder_attn")
                lp["encoder_attn_layer_norm"] = ln_p(
                    f"{pre}.encoder_attn_layer_norm"
                )
            layers.append(lp)
        return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *layers)

    return {
        "shared": {"embedding": jnp.asarray(g("shared.weight"))},
        "pos_table": jnp.asarray(
            sinusoidal_table(
                cfg.max_position_embeddings, cfg.d_model, cfg.pad_token_id
            )
        ),
        "encoder": {
            "layers": stack("encoder", cfg.encoder_layers, False),
            "layer_norm": ln_p("encoder.layer_norm"),
        },
        "decoder": {
            "layers": stack("decoder", cfg.decoder_layers, True),
            "layer_norm": ln_p("decoder.layer_norm"),
        },
    }


def load_hf_checkpoint(path: str) -> tuple[Params, TextSeq2SeqConfig]:
    """HF dir (config.json + model.safetensors / pytorch_model.bin)."""
    with open(os.path.join(path, "config.json")) as f:
        cfg = config_from_hf_dict(json.load(f))
    st_path = os.path.join(path, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        sd = load_file(st_path)
    else:
        import torch

        sd = torch.load(
            os.path.join(path, "pytorch_model.bin"), map_location="cpu",
            weights_only=True,
        )
    return params_from_hf_state_dict(sd, cfg), cfg
