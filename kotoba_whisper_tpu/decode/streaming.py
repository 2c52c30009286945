"""Continuous-batching greedy decode (batch refill across utterances).

Why: lockstep batch decode (decode/greedy.py — the shape of the
reference's `generate()` loop, run_pseudo_labelling.py:333-344) runs every
batch until its LONGEST row finishes, so with the real pseudo-label length
distribution (~25-token median, long tail — misc/data_statistics.json) a
large batch wastes most of its rows in the tail. This module keeps the
decode window full instead: every row holds its own utterance at its own
position, and when rows finish they are refilled with freshly-encoded
utterances while the rest keep stepping.

TPU-first design — everything stays static-shape jit programs:
- the decode window is a fixed (W,)-row state whose KV cache carries a
  PER-ROW length vector (models/whisper.py row_lengths decode path:
  per-row position gathers, per-row scatter KV writes, per-row valid
  masks in ops/decode_attention.py);
- `steps` runs K decode steps per dispatch (one host sync per round, not
  per token);
- `refill` is one jitted scatter of a freshly prefilled E-row pool batch
  into the free rows (free rows are found with an argsort on the finished
  mask — no host-side row bookkeeping on the hot path);
- the host loop only: harvests finished rows, feeds the next E raw mel
  windows to the jitted encode+prefill, and triggers refills.

Greedy rows are independent (no cross-row interaction anywhere in the
model, the rules, or the argmax), so streaming output is token-identical
to per-utterance generate_greedy — asserted by tests/test_streaming_decode.py.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from kotoba_whisper_tpu.core.config import SpecialTokens, WhisperConfig
from kotoba_whisper_tpu.decode.greedy import GenerateOptions
from kotoba_whisper_tpu.decode.logits_rules import apply_rules
from kotoba_whisper_tpu.models import whisper


@dataclass(frozen=True)
class StreamConfig:
    batch: int = 48            # decode window rows (W)
    encode_batch: int = 16     # utterances encoded+prefilled per refill (E)
    steps_per_round: int = 8   # decode steps per host sync


class StreamState(NamedTuple):
    tokens: jax.Array     # (W, max_len) int32
    finished: jax.Array   # (W,) bool
    active: jax.Array     # (W,) bool — holds an unharvested utterance
    stop: jax.Array       # (W,) int32 — max total tokens for the row
    utt_id: jax.Array     # (W,) int32 — stream index occupying the row
    cache: whisper.KVCache  # length is the (W,) per-row vector


def _prompt_tokens(opts: GenerateOptions, pad: int, rows: int) -> jnp.ndarray:
    t = jnp.full((rows, opts.max_length), pad, jnp.int32)
    return t.at[:, : len(opts.prompt_ids)].set(
        jnp.asarray(opts.prompt_ids, jnp.int32)[None]
    )


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "opts", "compute_dtype", "attn_impl", "kv_dtype", "rows"
    ),
)
def _empty_state(
    params, cfg: WhisperConfig, opts: GenerateOptions, *,
    rows: int, compute_dtype, attn_impl, kv_dtype,
) -> StreamState:
    """All-free window: every row finished+inactive, cache zero-filled
    (built through init_cache on a zero encoder output so the quantized
    cache layout matches exactly)."""
    enc = jnp.zeros(
        (rows, cfg.max_source_positions, cfg.d_model), compute_dtype
    )
    cache = whisper.init_cache(
        params, cfg, enc, capacity=opts.max_length,
        compute_dtype=compute_dtype, kv_dtype=kv_dtype,
    )
    p = len(opts.prompt_ids)
    cache = cache._replace(
        length=jnp.full((rows,), max(p - 1, 0), jnp.int32)
    )
    return StreamState(
        tokens=_prompt_tokens(opts, cfg.pad_token_id, rows),
        finished=jnp.ones((rows,), bool),
        active=jnp.zeros((rows,), bool),
        stop=jnp.full((rows,), opts.max_length, jnp.int32),
        utt_id=jnp.full((rows,), -1, jnp.int32),
        cache=cache,
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "opts", "compute_dtype", "attn_impl", "kv_dtype"),
)
def _prep_pool(
    params, cfg: WhisperConfig, mel: jax.Array, opts: GenerateOptions, *,
    compute_dtype, attn_impl, kv_dtype,
):
    """Encode + prompt-prefill a pool batch: (E, n_mels, 3000) ->
    (tokens (E, max_len), cache with per-row length p-1)."""
    e = mel.shape[0]
    p = len(opts.prompt_ids)
    enc = whisper.encode(
        params, cfg, mel.astype(compute_dtype),
        compute_dtype=compute_dtype, attn_impl=attn_impl,
    )
    cache = whisper.init_cache(
        params, cfg, enc, capacity=opts.max_length,
        compute_dtype=compute_dtype, kv_dtype=kv_dtype,
    )
    tokens = _prompt_tokens(opts, cfg.pad_token_id, e)
    if p > 1:
        _, cache = whisper.decode(
            params, cfg, tokens[:, : p - 1], cache=cache,
            compute_dtype=compute_dtype, attn_impl=attn_impl,
        )
    cache = cache._replace(length=jnp.full((e,), p - 1, jnp.int32))
    return tokens, cache


@partial(jax.jit, donate_argnums=(0,))
def _refill(state: StreamState, pool_tokens, pool_cache,
            pool_stop, pool_utt, pool_valid) -> StreamState:
    """Scatter an E-row pool batch into the window's free rows. The caller
    guarantees >= E rows are free (finished or inactive). The window state
    is DONATED: the multi-GB KV cache is updated in place — without
    donation the scatter doubles the window's HBM footprint and OOMs a
    v5e at production window sizes."""
    e = pool_tokens.shape[0]
    free = state.finished | ~state.active
    # free rows first, stable; take E targets
    idx = jnp.argsort(~free, stable=True)[:e]

    def put(dst, src, batch_axis):
        # direct scatter on the batch axis — NO moveaxis: a transpose of
        # the (L, W, 1500, D) cross-KV would materialize multi-GB copies
        # per refill and dominate the whole decode (measured on-chip)
        if batch_axis == 0:
            return dst.at[idx].set(src)
        assert batch_axis == 1
        return dst.at[:, idx].set(src)

    cache = state.cache
    new_cache = whisper.KVCache(
        put(cache.self_k, pool_cache.self_k, 1),
        put(cache.self_v, pool_cache.self_v, 1),
        put(cache.cross_k, pool_cache.cross_k, 1),
        put(cache.cross_v, pool_cache.cross_v, 1),
        put(cache.length, pool_cache.length, 0),
        *[
            None if a is None else put(a, b, 1)
            for a, b in (
                (cache.self_k_scale, pool_cache.self_k_scale),
                (cache.self_v_scale, pool_cache.self_v_scale),
                (cache.cross_k_scale, pool_cache.cross_k_scale),
                (cache.cross_v_scale, pool_cache.cross_v_scale),
            )
        ],
    )
    return StreamState(
        tokens=state.tokens.at[idx].set(pool_tokens),
        finished=state.finished.at[idx].set(~pool_valid),
        active=state.active.at[idx].set(pool_valid),
        stop=state.stop.at[idx].set(pool_stop),
        utt_id=state.utt_id.at[idx].set(pool_utt),
        cache=new_cache,
    )


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "opts", "special", "n_steps",
        "compute_dtype", "attn_impl", "kv_dtype",
    ),
    donate_argnums=(2,),  # state: in-place KV updates (see _refill note)
)
def _steps(
    params, cfg: WhisperConfig, state: StreamState, opts: GenerateOptions,
    special: SpecialTokens, *, n_steps: int,
    compute_dtype, attn_impl, kv_dtype,
) -> StreamState:
    """Run up to n_steps per-row decode steps (early exit when all rows
    are finished)."""
    rc = opts.rule_config(special)
    pad = cfg.pad_token_id
    eot = special.eot
    w = state.tokens.shape[0]
    rows = jnp.arange(w)

    def cond(carry):
        i, st = carry
        return (i < n_steps) & ~jnp.all(st.finished)

    def body(carry):
        i, st = carry
        was_finished = st.finished
        # feed the token at slot cache.length (the last valid token)
        last = st.tokens[rows, st.cache.length][:, None]
        logits, cache = whisper.decode(
            params, cfg, last, cache=st.cache,
            compute_dtype=compute_dtype, attn_impl=attn_impl,
        )
        count = cache.length  # per-row valid-token count after this step
        masked = apply_rules(
            logits[:, 0].astype(jnp.float32), st.tokens, count, rc
        )
        nxt = jnp.argmax(masked, axis=-1).astype(jnp.int32)
        nxt = jnp.where(was_finished, pad, nxt)
        # write the sampled token at slot `count` (per-row scatter);
        # finished rows rewrite their existing value
        cur = st.tokens[rows, count]
        tokens = st.tokens.at[rows, count].set(
            jnp.where(was_finished, cur, nxt)
        )
        finished = was_finished | (nxt == eot) | (count + 1 >= st.stop)
        # freeze finished rows' cache position (their step re-wrote the
        # same slot with the same key/value, so state stays exact)
        cache = cache._replace(
            length=jnp.where(was_finished, st.cache.length, cache.length)
        )
        return i + 1, StreamState(
            tokens, finished, st.active, st.stop, st.utt_id, cache
        )

    _, state = jax.lax.while_loop(cond, body, (jnp.asarray(0), state))
    return state


def generate_greedy_streaming(
    params,
    cfg: WhisperConfig,
    mels: np.ndarray,
    opts: GenerateOptions,
    special: SpecialTokens,
    *,
    compute_dtype=jnp.float32,
    attn_impl: str = "xla",
    kv_dtype: str = "compute",
    stream: StreamConfig = StreamConfig(),
    stop_at: np.ndarray | None = None,
) -> np.ndarray:
    """(N, n_mels, 3000) -> (N, max_length) token ids, N arbitrary.

    Token-identical to generate_greedy row-for-row; rows are refilled as
    they finish so throughput tracks the MEAN sequence length instead of
    the per-batch max. `stop_at` optionally caps each utterance's total
    token count (used by the realistic-length bench)."""
    n = mels.shape[0]
    w, e = stream.batch, stream.encode_batch
    assert e <= w
    p = len(opts.prompt_ids)
    if stop_at is None:
        stop_at = np.full((n,), opts.max_length, np.int64)
    stop_at = np.minimum(np.asarray(stop_at), opts.max_length)
    assert stop_at.min() > p, "stop_at must allow at least one sampled token"

    kw = dict(compute_dtype=compute_dtype, attn_impl=attn_impl,
              kv_dtype=kv_dtype)
    state = _empty_state(params, cfg, opts, rows=w, **kw)

    results: dict[int, np.ndarray] = {}
    next_utt = 0

    def refill_once(state):
        nonlocal next_utt
        lo = next_utt
        hi = min(lo + e, n)
        batch = np.zeros((e,) + mels.shape[1:], np.float32)
        batch[: hi - lo] = mels[lo:hi]
        valid = np.zeros((e,), bool)
        valid[: hi - lo] = True
        stops = np.full((e,), opts.max_length, np.int64)
        stops[: hi - lo] = stop_at[lo:hi]
        utts = np.full((e,), -1, np.int64)
        utts[: hi - lo] = np.arange(lo, hi)
        next_utt = hi
        pool_tokens, pool_cache = _prep_pool(
            params, cfg, jnp.asarray(batch), opts, **kw
        )
        return _refill(
            state, pool_tokens, pool_cache,
            jnp.asarray(stops, jnp.int32), jnp.asarray(utts, jnp.int32),
            jnp.asarray(valid),
        )

    # initial fill: as many pool batches as fit in the window
    filled = 0
    while next_utt < n and filled + e <= w:
        state = refill_once(state)
        filled += e

    while len(results) < n:
        state = _steps(
            params, cfg, state, opts, special,
            n_steps=stream.steps_per_round, **kw,
        )
        tokens, finished, active, utt_id = jax.device_get(
            (state.tokens, state.finished, state.active, state.utt_id)
        )
        for r in np.nonzero(finished & active)[0]:
            uid = int(utt_id[r])
            if uid >= 0 and uid not in results:
                results[uid] = tokens[r].copy()
        n_free = int(np.sum(finished | ~active))
        while next_utt < n and n_free >= e:
            state = refill_once(state)
            n_free -= e

    return np.stack([results[i] for i in range(n)])
