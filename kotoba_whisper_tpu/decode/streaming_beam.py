"""Continuous-batching BEAM search (group refill across utterances).

The lockstep beam decoder (decode/beam.py — the reference's
`generate(num_beams=N)` loop, run_pseudo_labelling.py:302-311) runs every
batch until its slowest ROW's beam search terminates, re-introducing
exactly the longest-row tail waste that decode/streaming.py eliminates
for greedy. This module lays each utterance's K beams on K consecutive
rows of the shared-ring decode window ("beam groups"); groups that
terminate are harvested and refilled with freshly-encoded utterances
while the other groups keep stepping.

TPU-first structure (all static shapes, one jit program per phase):

- the window is (G groups) x (K beams) = W rows over the SAME shared-slot
  ring KV cache as greedy streaming: every step all rows write the same
  ring slot, each row attends to its own last `count` slots via the
  cyclic-age mask. All rows of a group carry the same count, so the beam
  reorder (a batch-axis gather with a per-group block-diagonal
  permutation) keeps ring ages aligned;
- refilled groups REPLAY their prompt through the shared step loop (K
  identical rows replaying the same prompt — the same cost shape as the
  lockstep prefill, which also runs all K beams through the prompt);
  beam bookkeeping is frozen during replay;
- per-step beam math is the lockstep algorithm verbatim, vectorized over
  groups with per-group cur_len: log_softmax before rules, top-2K over
  (K*V), finished set of K with length-penalized scores, HF's -1e9
  stopping-hit arithmetic, and the early_stopping=False heuristic
  (decode/beam.py documents the contract; parity target
  transformers' _beam_search);
- a group terminates when its heuristic is satisfied or its sequences
  reach the group's stop length; the host harvests best-finished (or
  best-alive) per group, exactly generate_beam's output selection.

Output is token-exact vs generate_beam per utterance, with scores equal
to float32 ulp (tests/test_streaming_beam.py), for any window/refill
geometry: beam groups are independent of each other, and each group's
step sequence is the lockstep algorithm's. (The shared-cross-KV layout
fans each group's beam queries over one KV row; that attention's
reduction tiling depends on the group count, so scores can differ from
the lockstep program shape by an ulp.)
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from kotoba_whisper_tpu.core.config import SpecialTokens, WhisperConfig
from kotoba_whisper_tpu.decode.beam import NEG_INF, _gather_beams
from kotoba_whisper_tpu.decode.greedy import GenerateOptions
from kotoba_whisper_tpu.decode.logits_rules import apply_rules
from kotoba_whisper_tpu.decode.streaming import pin_default_layout
from kotoba_whisper_tpu.models import whisper


@dataclass(frozen=True)
class BeamStreamConfig:
    groups: int = 8            # utterance groups resident in the window
    num_beams: int = 5         # K — window rows = groups * num_beams
    encode_batch: int = 4      # utterances encoded per refill (E <= groups)
    steps_per_round: int = 64  # backstop; rounds exit early on-device
    length_penalty: float = 1.0
    prefetch: bool = False     # speculative next-slice encode (see
    # decode/streaming.py StreamConfig.prefetch — same cross-program
    # handoff caveat; fused encode+refill is the safe default)
    source_windows: int = 256  # device-resident mel slab (numpy sources)
    layout: str = "ring"       # "ring" | "scatter" self-KV layout.
    # "ring" is the fast path (one shared-slot dynamic_update_slice per
    # step). Its slot order ROTATES per refill, which permutes the
    # attention summation order — mathematically exact, but float32
    # scores can drift from lockstep by ~1 ulp (tokens still match unless
    # a top-k tie sits within that ulp). "scatter" writes each row's KV
    # at its own position (slot = sequence index, the lockstep order):
    # bitwise TOKEN parity with generate_beam (scores to f32 ulp — the
    # shared-cross-KV attention tiles by group count), at the cost of a
    # per-row scatter per step (measured slower for greedy streaming,
    # tools/stream_exp.py).


class BeamStreamState(NamedTuple):
    # per-row (W = G*K)
    tokens: jax.Array      # (W, max_len) int32
    cache: whisper.KVCache  # length: (W,) per-row token count
    ring: jax.Array        # () int32 shared ring slot
    # per-group (G,)
    alive_logp: jax.Array  # (G, K) running sum-logprob per alive beam
    fin_tokens: jax.Array  # (G, K, max_len)
    fin_scores: jax.Array  # (G, K)
    fin_exists: jax.Array  # (G, K) bool
    unsat: jax.Array       # (G,) early-stop heuristic still unsatisfied
    done: jax.Array        # (G,) terminated (or never filled)
    active: jax.Array      # (G,) holds an unharvested utterance
    stop: jax.Array        # (G,) int32 max total tokens for the group
    utt_id: jax.Array      # (G,) int32 stream index occupying the group


def _prompt_tokens(opts: GenerateOptions, pad: int, rows: int) -> jnp.ndarray:
    t = jnp.full((rows, opts.max_length), pad, jnp.int32)
    return t.at[:, : len(opts.prompt_ids)].set(
        jnp.asarray(opts.prompt_ids, jnp.int32)[None]
    )


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "opts", "g", "k", "compute_dtype", "attn_impl", "kv_dtype"
    ),
)
def _empty_state(
    params, cfg: WhisperConfig, opts: GenerateOptions, *,
    g: int, k: int, compute_dtype, attn_impl, kv_dtype,
) -> BeamStreamState:
    w = g * k
    # cross-KV held once per GROUP (shared across the K beams; see
    # init_cache beam_size) — self-KV at full w rows
    enc = jnp.zeros(
        (g, cfg.max_source_positions, cfg.d_model), compute_dtype
    )
    cache = whisper.init_cache(
        params, cfg, enc, capacity=opts.max_length,
        compute_dtype=compute_dtype, kv_dtype=kv_dtype, beam_size=k,
    )
    cache = cache._replace(length=jnp.zeros((w,), jnp.int32))
    return pin_default_layout(BeamStreamState(
        tokens=_prompt_tokens(opts, cfg.pad_token_id, w),
        cache=cache,
        ring=jnp.zeros((), jnp.int32),
        alive_logp=jnp.full((g, k), NEG_INF, jnp.float32),
        fin_tokens=jnp.full((g, k, opts.max_length), cfg.pad_token_id,
                            jnp.int32),
        fin_scores=jnp.full((g, k), NEG_INF, jnp.float32),
        fin_exists=jnp.zeros((g, k), bool),
        unsat=jnp.zeros((g,), bool),
        done=jnp.ones((g,), bool),
        active=jnp.zeros((g,), bool),
        stop=jnp.full((g,), opts.max_length, jnp.int32),
        utt_id=jnp.full((g,), -1, jnp.int32),
    ))


def _refill_impl_beam(
    params, cfg: WhisperConfig, state: BeamStreamState, enc: jax.Array,
    pool_tokens, pool_stop, pool_utt, pool_valid, *,
    opts: GenerateOptions, k: int, use_ring: bool,
    compute_dtype, attn_impl, kv_dtype,
) -> BeamStreamState:
    """Expand E encoded utterances over K beams, PREFILL the prompt
    (p-1 tokens, one multi-token pass — the same program shape as
    decode/beam.py's prefill, which keeps scatter-layout scores bitwise
    equal to lockstep AND skips p replay steps per refill), and scatter
    cross-KV + self-KV prefix into the window's free groups as one donated
    program. Traced inside _refill_from_enc (prefetch pipeline) or
    _encode_refill_fused (default; see StreamConfig.prefetch caveat)."""
    e = pool_stop.shape[0]
    p = len(opts.prompt_ids)
    enc = enc.astype(compute_dtype)
    # cross-KV computed once per utterance (shared across its K beams);
    # the prompt prefill fans beam queries over it via decode(beam_size)
    pool_cache = whisper.init_cache(
        params, cfg, enc, capacity=max(p - 1, 1),
        compute_dtype=compute_dtype, kv_dtype=kv_dtype, beam_size=k,
    )
    if p > 1:
        _, pool_cache = whisper.decode(
            params, cfg, pool_tokens[:, : p - 1], cache=pool_cache,
            compute_dtype=compute_dtype, attn_impl=attn_impl, beam_size=k,
        )

    free = state.done | ~state.active
    gidx = jnp.argsort(~free, stable=True)[:e]          # (E,) target groups
    ridx = (gidx[:, None] * k + jnp.arange(k)).reshape(-1)  # (E*K,) rows

    def put(dst, src):
        # cross-KV buffers: one row per GROUP
        return dst.at[:, gidx].set(src)

    cap = state.tokens.shape[1]
    # self-KV prefix destination slots: position-order 0..p-2 in scatter
    # layout; the `count` slots trailing the CURRENT ring slot in ring
    # layout (the age mask reads (ring - slot) mod cap < count)
    if use_ring:
        slots = jnp.mod(
            state.ring - (p - 1) + jnp.arange(max(p - 1, 1)), cap
        )
    else:
        slots = jnp.arange(max(p - 1, 1))

    def put_self(dst, src):
        return dst.at[:, ridx[:, None], slots[None, :]].set(
            src[:, :, : slots.shape[0]].astype(dst.dtype)
        )

    cache = state.cache
    new_cache = cache._replace(
        cross_k=put(cache.cross_k, pool_cache.cross_k),
        cross_v=put(cache.cross_v, pool_cache.cross_v),
        length=cache.length.at[ridx].set(p - 1),
        cross_k_scale=(
            None if cache.cross_k_scale is None
            else put(cache.cross_k_scale, pool_cache.cross_k_scale)
        ),
        cross_v_scale=(
            None if cache.cross_v_scale is None
            else put(cache.cross_v_scale, pool_cache.cross_v_scale)
        ),
    )
    if p > 1:
        new_cache = new_cache._replace(
            self_k=put_self(new_cache.self_k, pool_cache.self_k),
            self_v=put_self(new_cache.self_v, pool_cache.self_v),
            self_k_scale=(
                None if new_cache.self_k_scale is None
                else put_self(new_cache.self_k_scale, pool_cache.self_k_scale)
            ),
            self_v_scale=(
                None if new_cache.self_v_scale is None
                else put_self(new_cache.self_v_scale, pool_cache.self_v_scale)
            ),
        )
    # fresh beam bookkeeping: beam 0 live, others NEG_INF (decode/beam.py)
    init_logp = jnp.tile(
        jnp.asarray([0.0] + [NEG_INF] * (k - 1), jnp.float32), (e, 1)
    )
    max_len = state.tokens.shape[1]
    return pin_default_layout(BeamStreamState(
        tokens=state.tokens.at[ridx].set(pool_tokens),
        cache=new_cache,
        ring=state.ring,
        alive_logp=state.alive_logp.at[gidx].set(init_logp),
        fin_tokens=state.fin_tokens.at[gidx].set(
            jnp.full((e, k, max_len), cfg.pad_token_id, jnp.int32)
        ),
        fin_scores=state.fin_scores.at[gidx].set(NEG_INF),
        fin_exists=state.fin_exists.at[gidx].set(False),
        unsat=state.unsat.at[gidx].set(pool_valid),
        done=state.done.at[gidx].set(~pool_valid),
        active=state.active.at[gidx].set(pool_valid),
        stop=state.stop.at[gidx].set(pool_stop),
        utt_id=state.utt_id.at[gidx].set(pool_utt),
    ))


@partial(
    jax.jit,
    donate_argnums=(2,),
    static_argnames=(
        "cfg", "opts", "k", "use_ring", "compute_dtype", "attn_impl",
        "kv_dtype",
    ),
)
def _refill_from_enc(
    params, cfg: WhisperConfig, state: BeamStreamState, enc: jax.Array,
    pool_tokens, pool_stop, pool_utt, pool_valid, *,
    opts: GenerateOptions, k: int, use_ring: bool,
    compute_dtype, attn_impl, kv_dtype,
) -> BeamStreamState:
    """Prefetch-pipeline refill: consumes streaming._encode_only's
    (E*T, D)-flattened output."""
    e = pool_stop.shape[0]
    enc = enc.reshape(e, -1, enc.shape[-1])
    return _refill_impl_beam(
        params, cfg, state, enc, pool_tokens, pool_stop, pool_utt,
        pool_valid, opts=opts, k=k, use_ring=use_ring,
        compute_dtype=compute_dtype, attn_impl=attn_impl,
        kv_dtype=kv_dtype,
    )


@partial(
    jax.jit,
    donate_argnums=(2,),
    static_argnames=(
        "cfg", "opts", "k", "use_ring", "compute_dtype", "attn_impl",
        "kv_dtype",
    ),
)
def _encode_refill_fused(
    params, cfg: WhisperConfig, state: BeamStreamState, mel: jax.Array,
    pool_tokens, pool_stop, pool_utt, pool_valid, *,
    opts: GenerateOptions, k: int, use_ring: bool,
    compute_dtype, attn_impl, kv_dtype,
) -> BeamStreamState:
    """Fused encode+refill (no cross-program handoff; the default)."""
    enc = whisper.encode(
        params, cfg, mel.astype(compute_dtype),
        compute_dtype=compute_dtype, attn_impl=attn_impl,
    )
    return _refill_impl_beam(
        params, cfg, state, enc, pool_tokens, pool_stop, pool_utt,
        pool_valid, opts=opts, k=k, use_ring=use_ring,
        compute_dtype=compute_dtype, attn_impl=attn_impl,
        kv_dtype=kv_dtype,
    )


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "opts", "special", "k", "n_steps", "length_penalty",
        "use_ring", "compute_dtype", "attn_impl", "kv_dtype",
    ),
    donate_argnums=(2,),
)
def _steps(
    params, cfg: WhisperConfig, state: BeamStreamState,
    opts: GenerateOptions, special: SpecialTokens, free_for, *,
    k: int, n_steps: int, length_penalty: float, use_ring: bool,
    compute_dtype, attn_impl, kv_dtype,
) -> BeamStreamState:
    """Run shared-ring beam steps until >= free_for groups are free, every
    group is done, or n_steps elapse. Each step is the lockstep beam body
    vectorized over groups at per-group cur_len; groups still replaying
    their prompt advance the model but freeze their beam bookkeeping."""
    rc = opts.rule_config(special)
    eot = special.eot
    p = len(opts.prompt_ids)
    cap = opts.max_length
    w = state.tokens.shape[0]
    g = w // k
    rows = jnp.arange(w)

    def cond(carry):
        i, st = carry
        n_free = jnp.sum(st.done | ~st.active)
        return (i < n_steps) & ~jnp.all(st.done) & (n_free < free_for)

    def body(carry):
        i, st = carry
        was_done = st.done                       # (G,)
        count = st.cache.length                  # (W,) feeding index
        last = st.tokens[rows, jnp.minimum(count, cap - 1)][:, None]
        logits, cache = whisper.decode(
            params, cfg, last, cache=st.cache,
            ring_pos=st.ring if use_ring else None,
            compute_dtype=compute_dtype, attn_impl=attn_impl, beam_size=k,
        )
        new_count = cache.length                 # (W,) = count + 1
        # lockstep-beam correspondence: cur_len (index the new token is
        # written at) = new_count; identical across a group's rows
        cur_len = new_count.reshape(g, k)[:, 0]  # (G,)
        in_replay = cur_len < p                  # (G,)

        logp_step = apply_rules(
            jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1),
            st.tokens, new_count, rc,
        )                                        # (W, V)
        v = logp_step.shape[-1]
        logp = logp_step.reshape(g, k, v) + st.alive_logp[..., None]

        flat = logp.reshape(g, k * v)
        top_logp, top_idx = jax.lax.top_k(flat, 2 * k)
        top_beam = top_idx // v
        top_tok = top_idx % v

        tok3 = st.tokens.reshape(g, k, cap)
        cand_tokens = _gather_beams(tok3, top_beam, g)      # (G, 2K, L)
        # write the candidate token at per-group cur_len
        cand_tokens = jax.vmap(
            lambda tt, tk, cl: jax.lax.dynamic_update_slice_in_dim(
                tt, tk[:, None].astype(jnp.int32), cl, axis=1
            )
        )(cand_tokens, top_tok, cur_len)
        hits = (top_tok == eot) | (cur_len[:, None] + 1 >= st.stop[:, None])

        gen_len = jnp.maximum(
            (cur_len + 1 - p).astype(jnp.float32), 1.0
        )
        pen = gen_len ** length_penalty          # (G,)

        # finished set update (only ranks < K, only while unsat)
        top_num_beam = jnp.arange(2 * k)[None, :] < k
        eligible = hits & top_num_beam & st.unsat[:, None]
        cand_fin_scores = jnp.where(
            eligible, top_logp / pen[:, None], NEG_INF
        )
        all_fin_scores = jnp.concatenate(
            [st.fin_scores, cand_fin_scores], axis=1
        )
        all_fin_tokens = jnp.concatenate([st.fin_tokens, cand_tokens], axis=1)
        all_fin_exists = jnp.concatenate([st.fin_exists, eligible], axis=1)
        fin_top, fin_idx = jax.lax.top_k(all_fin_scores, k)
        fin_tokens = _gather_beams(all_fin_tokens, fin_idx, g)
        fin_scores = fin_top
        fin_exists = jnp.take_along_axis(all_fin_exists, fin_idx, axis=1)

        # alive set update
        alive_cand = top_logp + hits.astype(jnp.float32) * NEG_INF
        alive_top, alive_idx = jax.lax.top_k(alive_cand, k)
        new_tok3 = _gather_beams(cand_tokens, alive_idx, g)
        alive_beam = jnp.take_along_axis(top_beam, alive_idx, axis=1)

        # early-stop heuristic at the new length
        best_possible = alive_top[:, 0] / pen
        worst = jnp.where(
            fin_exists, jnp.min(fin_scores, axis=1, keepdims=True), NEG_INF
        )
        unsat_new = st.unsat & jnp.any(
            best_possible[:, None] > worst, axis=1
        )

        # ---- merge per-group updates, frozen for replaying/done groups --
        stepping = ~was_done & ~in_replay        # (G,) groups beam-stepping
        # replaying groups need no token write: the "prediction" is the
        # stored prompt token, already in place; done groups keep all state
        def sel(upd, keep):
            return jnp.where(
                stepping.reshape((g,) + (1,) * (upd.ndim - 1)), upd, keep
            )

        tokens = jnp.where(
            stepping[:, None, None], new_tok3, st.tokens.reshape(g, k, cap)
        ).reshape(w, cap)
        alive_logp = sel(alive_top, st.alive_logp)
        fin_tokens = sel(fin_tokens, st.fin_tokens)
        fin_scores = sel(fin_scores, st.fin_scores)
        fin_exists = sel(fin_exists, st.fin_exists)
        unsat = jnp.where(stepping, unsat_new, st.unsat)
        # termination: heuristic satisfied or sequences filled to stop
        done = was_done | (
            stepping & (~unsat | (cur_len + 1 >= st.stop))
        )

        # ---- cache reorder: block-diagonal permutation over beam rows --
        perm_g = jnp.where(
            stepping[:, None], alive_beam, jnp.arange(k)[None, :]
        )
        perm = (perm_g + jnp.arange(g)[:, None] * k).reshape(-1)
        cache = cache._replace(
            self_k=cache.self_k[:, perm],
            self_v=cache.self_v[:, perm],
            self_k_scale=(
                None if cache.self_k_scale is None
                else cache.self_k_scale[:, perm]
            ),
            self_v_scale=(
                None if cache.self_v_scale is None
                else cache.self_v_scale[:, perm]
            ),
            # freeze done groups' counts (their rows' ring writes are
            # hidden by the age mask once refilled)
            length=jnp.where(
                jnp.repeat(was_done, k), st.cache.length, new_count
            ),
        )
        new_ring = jnp.mod(st.ring + 1, cap) if use_ring else st.ring
        return i + 1, BeamStreamState(
            tokens, cache, new_ring,
            alive_logp, fin_tokens, fin_scores, fin_exists,
            unsat, done, st.active, st.stop, st.utt_id,
        )

    _, state = jax.lax.while_loop(cond, body, (jnp.asarray(0), state))
    return pin_default_layout(state)


def generate_beam_streaming(
    params,
    cfg: WhisperConfig,
    mels,
    opts: GenerateOptions,
    special: SpecialTokens,
    *,
    compute_dtype=jnp.float32,
    attn_impl: str = "xla",
    kv_dtype: str = "compute",
    stream: BeamStreamConfig = BeamStreamConfig(),
    stop_at: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(N, n_mels, 3000) -> (tokens (N, max_length), scores (N,)).

    Per-utterance output identical (tokens AND scores) to
    decode/beam.generate_beam with num_beams=stream.num_beams and the same
    length_penalty; groups are refilled as they terminate so throughput
    tracks the mean termination length. `stop_at` caps each utterance's
    total token count (the lockstep equivalent is max_length per call).

    Device residency: numpy mel sources are padded on host and uploaded
    in source_windows slabs (see decode/streaming.py)."""
    n = mels.shape[0]
    g, k, e = stream.groups, stream.num_beams, stream.encode_batch
    assert e <= g
    p = len(opts.prompt_ids)
    if stop_at is None:
        stop_at = np.full((n,), opts.max_length, np.int64)
    stop_at = np.minimum(np.asarray(stop_at), opts.max_length)
    assert stop_at.min() > p

    kw = dict(compute_dtype=compute_dtype, attn_impl=attn_impl,
              kv_dtype=kv_dtype)
    state = _empty_state(params, cfg, opts, g=g, k=k, **kw)

    out_tokens: dict[int, np.ndarray] = {}
    out_scores: dict[int, float] = {}
    next_utt = 0
    pool_tokens = jnp.asarray(
        np.asarray(_prompt_tokens(opts, cfg.pad_token_id, e * k))
    )

    n_pad = n if n % e == 0 else n + (e - n % e)
    if isinstance(mels, jax.Array):
        if n % e:
            mels = jnp.pad(mels, ((0, n_pad - n), (0, 0), (0, 0)))
        mels_host, slab_size = None, n_pad
        mels_dev, slab_lo = mels, 0
    else:
        mels_host = np.asarray(mels)
        if n % e:
            mels_host = np.pad(mels_host, ((0, n_pad - n), (0, 0), (0, 0)))
        slab_size = max(stream.source_windows - stream.source_windows % e, e)
        mels_dev, slab_lo = jnp.asarray(mels_host[:slab_size]), 0

    from kotoba_whisper_tpu.decode.streaming import _encode_only

    pending: tuple[int, jax.Array] | None = None

    def mel_slice(lo):
        nonlocal mels_dev, slab_lo
        if lo - slab_lo >= slab_size:
            slab_lo = lo - lo % slab_size
            mels_dev = jnp.asarray(mels_host[slab_lo : slab_lo + slab_size])
        return jax.lax.dynamic_slice_in_dim(
            mels_dev, lo - slab_lo, e, axis=0
        )

    def encode_slice(lo):
        return _encode_only(
            params, cfg, mel_slice(lo),
            compute_dtype=compute_dtype, attn_impl=attn_impl,
        )

    def refill_once(state):
        nonlocal next_utt, pending
        lo = next_utt
        hi = min(lo + e, n)
        valid = np.zeros((e,), bool)
        valid[: hi - lo] = True
        stops = np.full((e,), opts.max_length, np.int64)
        stops[: hi - lo] = stop_at[lo:hi]
        utts = np.full((e,), -1, np.int64)
        utts[: hi - lo] = np.arange(lo, hi)
        next_utt = hi
        meta = (
            pool_tokens,
            jnp.asarray(stops, jnp.int32), jnp.asarray(utts, jnp.int32),
            jnp.asarray(valid),
        )
        if stream.prefetch:
            if pending is not None and pending[0] == lo:
                enc = pending[1]
                pending = None
            else:
                enc = encode_slice(lo)
            return _refill_from_enc(
                params, cfg, state, enc, *meta, opts=opts, k=k,
                use_ring=stream.layout == "ring", **kw,
            )
        return _encode_refill_fused(
            params, cfg, state, mel_slice(lo), *meta, opts=opts, k=k,
            use_ring=stream.layout == "ring", **kw,
        )

    filled = 0
    while next_utt < n and filled + e <= g:
        state = refill_once(state)
        filled += e

    while len(out_tokens) < n:
        want = e if next_utt < n else g + 1
        state = _steps(
            params, cfg, state, opts, special,
            jnp.asarray(want, jnp.int32),
            k=k, n_steps=stream.steps_per_round,
            length_penalty=stream.length_penalty,
            use_ring=stream.layout == "ring", **kw,
        )
        # speculative encode behind the round (see decode/streaming.py)
        if stream.prefetch and next_utt < n and pending is None:
            pending = (next_utt, encode_slice(next_utt))
        (done, active, utt_id, fin_tokens, fin_scores, fin_exists,
         alive_logp, tokens, length) = jax.device_get((
            state.done, state.active, state.utt_id, state.fin_tokens,
            state.fin_scores, state.fin_exists, state.alive_logp,
            state.tokens, state.cache.length,
        ))
        for gi in np.nonzero(done & active)[0]:
            uid = int(utt_id[gi])
            if uid < 0 or uid in out_tokens:
                continue
            # generate_beam's output selection: best finished if any,
            # else best alive with its length-penalized score
            if fin_exists[gi].any():
                out_tokens[uid] = fin_tokens[gi, 0].copy()
                out_scores[uid] = float(fin_scores[gi, 0])
            else:
                # lockstep's alive fallback divides by length_pen at the
                # final cur_len: gen_len = count + 1 - p (count = the
                # frozen per-row length at termination)
                cur_len = int(length[gi * k])
                bi = int(np.argmax(alive_logp[gi]))
                pen = max(cur_len + 1 - p, 1) ** stream.length_penalty
                out_tokens[uid] = tokens[gi * k + bi].copy()
                out_scores[uid] = float(alive_logp[gi, bi] / pen)
        n_free = int(np.sum(done | ~active))
        while next_utt < n and n_free >= e:
            state = refill_once(state)
            n_free -= e

    return (
        np.stack([out_tokens[i] for i in range(n)]),
        np.asarray([out_scores[i] for i in range(n)], np.float32),
    )
