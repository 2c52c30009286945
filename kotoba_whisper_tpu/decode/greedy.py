"""Greedy generation with KV cache under `lax.while_loop`.

TPU-native replacement for the `model.generate(...)` call at
run_pseudo_labelling.py:338 (greedy path): static shapes throughout — a
fixed-capacity token buffer and KV cache, lockstep batch stepping with a
finished mask, and early exit when every row has emitted <|endoftext|>.
Timestamp/suppress rules are applied by decode/logits_rules.py.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from kotoba_whisper_tpu.core.config import SpecialTokens, WhisperConfig
from kotoba_whisper_tpu.decode.logits_rules import RuleConfig, apply_rules
from kotoba_whisper_tpu.models import whisper


@dataclass(frozen=True)
class GenerateOptions:
    prompt_ids: tuple[int, ...]          # [sot, <|lang|>, <|task|>, (<|notimestamps|>)]
    max_length: int = 448
    return_timestamps: bool = True
    suppress_tokens: tuple[int, ...] = ()
    begin_suppress_tokens: tuple[int, ...] = ()
    max_initial_timestamp_index: int | None = 50
    detect_timestamp_from_logprob: bool = True

    def rule_config(self, st: SpecialTokens) -> RuleConfig:
        return RuleConfig(
            special=st,
            begin_index=len(self.prompt_ids),
            return_timestamps=self.return_timestamps,
            suppress_tokens=self.suppress_tokens,
            begin_suppress_tokens=self.begin_suppress_tokens,
            max_initial_timestamp_index=self.max_initial_timestamp_index,
            detect_timestamp_from_logprob=self.detect_timestamp_from_logprob,
        )


def transcribe_prompt(
    st: SpecialTokens, lang_id: int, task: str = "transcribe",
    timestamps: bool = True,
) -> tuple[int, ...]:
    """<|sot|><|lang|><|task|>[<|notimestamps|>] (set_prefix_tokens
    semantics, run_pseudo_labelling.py:234-237)."""
    task_id = st.transcribe if task == "transcribe" else st.translate
    ids = [st.sot, lang_id, task_id]
    if not timestamps:
        ids.append(st.no_timestamps)
    return tuple(ids)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "opts", "special", "compute_dtype", "attn_impl", "kv_dtype"
    ),
)
def generate_greedy(
    params,
    cfg: WhisperConfig,
    input_features: jax.Array,
    opts: GenerateOptions,
    special: SpecialTokens,
    *,
    compute_dtype=jnp.float32,
    attn_impl: str = "xla",
    kv_dtype: str = "compute",
    stop_at: jax.Array | None = None,
) -> jax.Array:
    """(B, n_mels, 3000) -> (B, max_length) token ids.

    Output rows are [prompt..., generated..., eot, pad, pad, ...]; pad is
    cfg.pad_token_id. Lockstep greedy: every row decodes until all rows have
    finished or max_length is hit. `stop_at` (B,) optionally caps each
    row's total token count (the row is marked finished once it holds
    stop_at[i] tokens); the loop still exits early when every row is
    finished — the lockstep cost is the per-batch MAX stop, which is the
    reference generate() loop's behavior under early stopping
    (run_pseudo_labelling.py:333-344) and the comparator measured against
    continuous batching in tools/stream_ab.py.
    """
    b = input_features.shape[0]
    p = len(opts.prompt_ids)
    max_len = opts.max_length
    assert p >= 1 and p < max_len
    rc = opts.rule_config(special)
    pad = cfg.pad_token_id
    eot = special.eot

    encoder_out = whisper.encode(
        params, cfg, input_features,
        compute_dtype=compute_dtype, attn_impl=attn_impl,
    )
    cache = whisper.init_cache(
        params, cfg, encoder_out, capacity=max_len,
        compute_dtype=compute_dtype, kv_dtype=kv_dtype,
    )

    tokens = jnp.full((b, max_len), pad, jnp.int32)
    tokens = tokens.at[:, :p].set(jnp.asarray(opts.prompt_ids, jnp.int32)[None])

    # Prefill all but the last prompt token; the loop body always feeds
    # tokens[:, cur_len-1], so logits for position cur_len-1 predict cur_len.
    if p > 1:
        _, cache = whisper.decode(
            params, cfg, tokens[:, : p - 1], cache=cache,
            compute_dtype=compute_dtype, attn_impl=attn_impl,
        )

    def cond(state):
        tokens, cache, finished, cur_len = state
        return (cur_len < max_len) & ~jnp.all(finished)

    def body(state):
        tokens, cache, finished, cur_len = state
        last = jax.lax.dynamic_slice_in_dim(tokens, cur_len - 1, 1, axis=1)
        logits, cache = whisper.decode(
            params, cfg, last, cache=cache,
            compute_dtype=compute_dtype, attn_impl=attn_impl,
        )
        masked = apply_rules(
            logits[:, 0].astype(jnp.float32), tokens, cur_len, rc
        )
        nxt = jnp.argmax(masked, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, pad, nxt)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, nxt[:, None], cur_len, axis=1
        )
        finished = finished | (nxt == eot)
        if stop_at is not None:
            finished = finished | (cur_len + 1 >= stop_at)
        return tokens, cache, finished, cur_len + 1

    finished = jnp.zeros((b,), bool)
    tokens, _, _, _ = jax.lax.while_loop(
        cond, body, (tokens, cache, finished, jnp.asarray(p, jnp.int32))
    )
    return tokens
