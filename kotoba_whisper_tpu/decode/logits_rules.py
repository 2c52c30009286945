"""Whisper generation logits rules as pure, batch-vectorized functions.

Reproduces the behavior of the HF logits processors the reference invokes
through `generate(..., return_timestamps=True)` (run_pseudo_labelling.py:338,
SURVEY.md §2.4 "generate() for Whisper"):

  - suppress-token masks (global and at-begin),
  - WhisperTimeStampLogitsProcessor: <|notimestamps|> suppressed; timestamps
    appear in pairs except directly before eot; timestamps monotonically
    non-decreasing; first sampled token forced to a timestamp capped at
    max_initial_timestamp_index; if total timestamp probability beats the max
    text-token probability, force a timestamp.

Everything is jnp on static shapes — no data-dependent Python control flow —
so the rules run inside `lax.while_loop` decode bodies and inside vmapped
beam steps.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from kotoba_whisper_tpu.core.config import SpecialTokens

NEG_INF = float("-inf")


@dataclass(frozen=True)
class RuleConfig:
    special: SpecialTokens
    begin_index: int                      # prompt/prefill length
    return_timestamps: bool = True
    suppress_tokens: tuple[int, ...] = ()
    begin_suppress_tokens: tuple[int, ...] = ()
    max_initial_timestamp_index: int | None = 50
    detect_timestamp_from_logprob: bool = True


def apply_rules(
    logits: jax.Array,      # (B, V) fp32
    tokens: jax.Array,      # (B, L) token buffer (prefill + generated so far)
    cur_len: jax.Array,     # int32: valid tokens in buffer — scalar
                            # (lockstep batch) or (B,) per-row counts
                            # (continuous-batching decode)
    rc: RuleConfig,
) -> jax.Array:
    """Masked logits for sampling position `cur_len` (0-based)."""
    b, v = logits.shape
    st = rc.special
    vocab_ids = jnp.arange(v)
    cur = jnp.asarray(cur_len, jnp.int32)
    if cur.ndim == 0:
        cur = cur[None]
    cur_col = cur[:, None]  # (B, 1) or (1, 1) — broadcasts over rows

    # global suppress list
    if rc.suppress_tokens:
        sup = jnp.zeros((v,), bool).at[jnp.asarray(rc.suppress_tokens)].set(True)
        logits = jnp.where(sup[None], NEG_INF, logits)

    # at-begin suppress (first sampled position only)
    if rc.begin_suppress_tokens:
        bsup = jnp.zeros((v,), bool).at[
            jnp.asarray(rc.begin_suppress_tokens)
        ].set(True)
        logits = jnp.where(
            (cur_col == rc.begin_index) & bsup[None], NEG_INF, logits
        )

    if not rc.return_timestamps:
        return logits

    ts_begin = st.timestamp_begin

    # --- WhisperTimeStampLogitsProcessor ---
    logits = logits.at[:, st.no_timestamps].set(NEG_INF)

    n_sampled = cur - rc.begin_index  # tokens generated after prompt
    last_tok = jnp.take_along_axis(
        tokens, jnp.broadcast_to(jnp.maximum(cur_col - 1, 0), (b, 1)), axis=1
    )[:, 0]
    penult_tok = jnp.take_along_axis(
        tokens, jnp.broadcast_to(jnp.maximum(cur_col - 2, 0), (b, 1)), axis=1
    )[:, 0]
    last_was_ts = (n_sampled >= 1) & (last_tok >= ts_begin)
    penult_was_ts = (n_sampled < 2) | (penult_tok >= ts_begin)

    is_ts_col = (vocab_ids >= ts_begin)[None]          # (1, V)
    is_text_lt_eot = (vocab_ids < st.eot)[None]

    # pairs rule
    logits = jnp.where(
        (last_was_ts & penult_was_ts)[:, None] & is_ts_col, NEG_INF, logits
    )
    logits = jnp.where(
        (last_was_ts & ~penult_was_ts)[:, None] & is_text_lt_eot, NEG_INF, logits
    )

    # monotonicity: mask timestamps < timestamp_last
    pos = jnp.arange(tokens.shape[1])[None]
    sampled_mask = (pos >= rc.begin_index) & (pos < cur_col)
    ts_mask = sampled_mask & (tokens >= ts_begin)
    any_ts = jnp.any(ts_mask, axis=1)
    last_ts_val = jnp.max(jnp.where(ts_mask, tokens, -1), axis=1)
    ts_last = jnp.where(
        last_was_ts & ~penult_was_ts, last_ts_val, last_ts_val + 1
    )
    below_last = (vocab_ids[None] >= ts_begin) & (vocab_ids[None] < ts_last[:, None])
    logits = jnp.where(any_ts[:, None] & below_last, NEG_INF, logits)

    # first sampled token must be a timestamp, capped at initial index
    at_begin = cur_col == rc.begin_index  # (B, 1) / (1, 1)
    logits = jnp.where(at_begin & (vocab_ids < ts_begin)[None], NEG_INF, logits)
    if rc.max_initial_timestamp_index is not None:
        last_allowed = ts_begin + rc.max_initial_timestamp_index
        logits = jnp.where(
            at_begin & (vocab_ids > last_allowed)[None], NEG_INF, logits
        )

    # probability rule: logsumexp(timestamps) > max(text) => force timestamp
    if rc.detect_timestamp_from_logprob:
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        ts_lse = jax.nn.logsumexp(
            jnp.where(is_ts_col, logprobs, NEG_INF), axis=-1
        )
        max_text = jnp.max(
            jnp.where(is_ts_col, NEG_INF, logprobs), axis=-1
        )
        force_ts = ts_lse > max_text
        logits = jnp.where(force_ts[:, None] & ~is_ts_col, NEG_INF, logits)

    return logits
