"""Continuous-batching greedy decode (batch refill across utterances).

Why: lockstep batch decode (decode/greedy.py — the shape of the
reference's `generate()` loop, run_pseudo_labelling.py:333-344) runs every
batch until its LONGEST row finishes, so with the real pseudo-label length
distribution (~25-token median, long tail — misc/data_statistics.json) a
large batch wastes most of its rows in the tail. This module keeps the
decode window full instead: every row holds its own utterance at its own
position, and when rows finish they are refilled with freshly-encoded
utterances while the rest keep stepping.

TPU-first design — everything stays static-shape jit programs, and the
per-step work is IDENTICAL in structure to the lockstep loop:

- the self-KV cache is a SHARED-SLOT RING: every step, all rows write
  their new K/V at the same ring slot (one dynamic_update_slice, exactly
  like lockstep decode), and each row's self-attention selects its own
  last `count` ring slots via a cyclic-age mask
  ((ring - slot) mod capacity < count). Whisper carries position only in
  the learned embedding and attention is permutation-invariant under the
  mask, so the scrambled physical slot order is exact. This replaces the
  round-1 per-row scatter layout, whose per-step scatters at per-row
  positions dominated the step cost (tools/stream_exp.py attribution);
- a refilled row's prompt is PREFILLED inside the refill program (one
  multi-token pass over the E-row pool; the self-KV prefix is scattered
  at the `count` ring slots trailing the current shared slot) — replacing
  the round-2 per-step replay, which cost ~|prompt| whole-window steps
  per refill. The step loop's replay path remains for prompt_len == 1;
- the NEXT pool slice's encoder pass is dispatched speculatively behind
  the running round, before the host sync (refill order is
  deterministic), hiding the remote-tunnel round-trip idle;
- `_steps` runs K decode steps per dispatch (one host sync per round,
  not per token);
- the host loop only: harvests finished rows, feeds the next E raw mel
  windows to the jitted encode+cross-init, and triggers refills.

Greedy rows are independent (no cross-row interaction anywhere in the
model, the rules, or the argmax), so streaming output is token-identical
to per-utterance generate_greedy — asserted by tests/test_streaming_decode.py.
"""
from __future__ import annotations

import os
import time
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
    encode_batch: int = 16     # utterances encoded per refill (E)
    prefetch: bool = False     # speculative next-slice encode, dispatched
    # behind the running round to hide the host-sync round trip. OFF by
    # default: it hands the encoder output between two executables, and
    # remote-attached plugins that cannot relayout cross-program arrays
    # fail on that handoff (observed RecursionError/OOM on the axon
    # plugin even with a 2-D canonical-layout handoff); the fused
    # encode+refill program is the safe default. Turn on for standard
    # TPU hosts.
    source_windows: int = 256  # max mel windows resident on device at
    # once when the caller passes a HOST (numpy) mel stream: the source is
    # uploaded in slabs of this many windows so arbitrary-N streams cannot
    # OOM HBM next to the window state ((256, 128, 3000) bf16 ≈ 188 MB).
    # Callers that pass an already-device jax.Array own residency and are
    # used whole (the bench stages its bounded stream up front).
    steps_per_round: int = 64  # max decode steps per host sync — the
    # round ends EARLY on-device once enough rows are free to refill
    # (free_for in _steps), so this is a backstop, not a cadence: each
    # host round-trip (a real cost on remote-attached chips) then
    # corresponds to one refill, not one fixed-size step batch


class StreamState(NamedTuple):
    tokens: jax.Array     # (W, max_len) int32
    finished: jax.Array   # (W,) bool
    active: jax.Array     # (W,) bool — holds an unharvested utterance
    stop: jax.Array       # (W,) int32 — max total tokens for the row
    utt_id: jax.Array     # (W,) int32 — stream index occupying the row
    ring: jax.Array       # () int32 — next shared self-KV write slot
    cache: whisper.KVCache  # length is the (W,) per-row token count


def _prompt_tokens(opts: GenerateOptions, pad: int, rows: int) -> jnp.ndarray:
    t = jnp.full((rows, opts.max_length), pad, jnp.int32)
    return t.at[:, : len(opts.prompt_ids)].set(
        jnp.asarray(opts.prompt_ids, jnp.int32)[None]
    )


def pin_default_layout(tree):
    """Constrain every array output to the canonical row-major layout
    (default tiling). The stream pipeline's programs exchange multi-GB
    state buffers; when one executable picks a custom output layout, the
    next program's dispatch must relayout the array — which this
    environment's remote plugin cannot do (dispatch-time RecursionError /
    allocation blowups, observed on-chip round 3). Pinning every PRODUCER
    to the same layout removes the need for relayout.

    OPT-IN via KWT_PIN_LAYOUTS=1 (read at trace time — set it before the
    first stream call): the default fused pipeline keeps all big buffers
    inside one program chain that needs no relayout, and the pin costs a
    measured ~3% stream throughput (compiler layout freedom). Enable it
    together with StreamConfig.prefetch on runtimes whose relayout is
    broken; note int4 KV still cannot cross programs on the axon plugin
    even pinned (docs/DESIGN.md)."""
    if os.environ.get("KWT_PIN_LAYOUTS", "0") == "0":
        return tree
    from jax.experimental.layout import Layout, with_layout_constraint

    def pin(x):
        if getattr(x, "ndim", 0) < 2:
            return x
        # packed sub-byte buffers (int4 KV) must carry their packing in
        # the pinned layout, or consumers see a mismatched (unpacked)
        # layout and hit the same relayout failure
        sub = 4 if x.dtype in (jnp.int4, jnp.uint4) else 0
        return with_layout_constraint(
            x, Layout(major_to_minor=tuple(range(x.ndim)),
                      sub_byte_element_size_in_bits=sub)
        )

    return jax.tree.map(pin, tree)


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
    """All-free window: every row finished+inactive, count 0, cache
    zero-filled (built through init_cache on a zero encoder output so the
    quantized cache layout matches exactly)."""
    enc = jnp.zeros(
        (rows, cfg.max_source_positions, cfg.d_model), compute_dtype
    )
    cache = whisper.init_cache(
        params, cfg, enc, capacity=opts.max_length,
        compute_dtype=compute_dtype, kv_dtype=kv_dtype,
    )
    cache = cache._replace(length=jnp.zeros((rows,), jnp.int32))
    return pin_default_layout(StreamState(
        tokens=_prompt_tokens(opts, cfg.pad_token_id, rows),
        finished=jnp.ones((rows,), bool),
        active=jnp.zeros((rows,), bool),
        stop=jnp.full((rows,), opts.max_length, jnp.int32),
        utt_id=jnp.full((rows,), -1, jnp.int32),
        ring=jnp.zeros((), jnp.int32),
        cache=cache,
    ))


@partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "attn_impl"),
)
def _encode_only(params, cfg: WhisperConfig, mel: jax.Array, *,
                 compute_dtype, attn_impl) -> jax.Array:
    """Encoder pass for one pool slice. Split from the refill scatter so
    the host can dispatch it SPECULATIVELY, before syncing the running
    round: on remote-attached chips the sync round-trip costs ~100 ms of
    device idle per round (KWT_STREAM_TRACE attribution, round 3); a
    pre-queued encode keeps the chip busy through it. The persistent
    output is only the (E, 1500, D) encoder state (~61 MB at E=16 bf16) —
    the multi-GB cross-KV stays an in-program temporary of the refill.

    Returned FLATTENED to (E*T, D): a cross-program array handoff whose
    producer chose a non-default layout makes the consumer's dispatch
    relayout it, which this environment's remote plugin cannot do
    (observed RecursionError/OOM); 2-D matmul-shaped outputs get the
    default layout. The refill reshapes back."""
    enc = whisper.encode(
        params, cfg, mel.astype(compute_dtype),
        compute_dtype=compute_dtype, attn_impl=attn_impl,
    )
    return pin_default_layout(enc.reshape(-1, enc.shape[-1]))


def _refill_impl(
    params, cfg: WhisperConfig, state: StreamState, enc: jax.Array,
    pool_tokens, pool_stop, pool_utt, pool_valid, *,
    opts: GenerateOptions, compute_dtype, attn_impl, kv_dtype,
) -> StreamState:
    """Prompt prefill + cross-KV projection + quantize + scatter, FUSED
    per layer under one lax.scan over the stacked decoder layers. Traced
    inside _refill_from_enc (split pipeline) or _encode_refill_fused.

    Why fused: building the whole pool cache first (init_cache) holds the
    E-row quantized cross-KV (~2 GB at E=16, large-v3 int8) as a live
    buffer next to the donated window state — with the speculative encode
    queued behind the running round, that transient tipped a 16 GB v5e
    over (measured OOM, round 3). Here each scan step computes ONE
    layer's cross K/V from the encoder states, runs the prompt block
    through that layer (causal self + cross + MLP — replacing the
    round-2 per-step prompt replay, ~|prompt| whole-window steps per
    refill), quantizes, and scatters straight into the donated window
    cache: peak extra memory is one layer's full-precision K/V
    (~120 MB), not the whole pool. The self-KV prefix lands at the
    `count` ring slots trailing the current shared slot (the age-mask
    convention decode/streaming_beam.py shares)."""
    p = len(opts.prompt_ids)
    e = pool_stop.shape[0]
    dec = params["decoder"]
    n_heads = cfg.decoder_attention_heads
    eps = cfg.layer_norm_eps
    cap = state.tokens.shape[1]
    enc = enc.astype(compute_dtype)

    from kotoba_whisper_tpu.models.whisper import (
        dense,
        layer_norm,
        merge_heads,
        quantize_kv_heads,
        quantize_kv_rows,
        split_heads,
    )
    from kotoba_whisper_tpu.ops.attention import attention

    free = state.finished | ~state.active
    idx = jnp.argsort(~free, stable=True)[:e]
    slots = jnp.mod(state.ring - (p - 1) + jnp.arange(max(p - 1, 1)), cap)

    quant = kv_dtype in ("int8", "int4")

    def q_cross(v):
        if kv_dtype == "int4":
            return quantize_kv_heads(v, n_heads, jnp.int4)
        return quantize_kv_rows(v)

    def q_self(v):
        if kv_dtype == "int4":  # int4 mode keeps self at int8, same scales
            return quantize_kv_heads(v, n_heads, jnp.int8)
        return quantize_kv_rows(v)

    if p > 1:
        ids = pool_tokens[:, : p - 1]
        x0 = dec["embed_tokens"]["embedding"].astype(compute_dtype)[ids]
        x0 = x0 + dec["pos_embedding"].astype(compute_dtype)[None, : p - 1]
    else:
        x0 = jnp.zeros((e, 1, cfg.d_model), compute_dtype)  # unused

    cache = state.cache

    def body(carry, xs):
        lp, l = xs
        x, sk, sv, ck, cv, sks, svs, cks, cvs = carry

        if p > 1:
            h = layer_norm(lp["self_attn_layer_norm"], x, eps)
            sa = lp["self_attn"]
            if "qkv_proj" in sa:
                qkv = dense(sa["qkv_proj"], h)
                q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
            else:
                q = dense(sa["q_proj"], h)
                k_new = dense(sa["k_proj"], h)
                v_new = dense(sa["v_proj"], h)
            o = attention(
                split_heads(q, n_heads), split_heads(k_new, n_heads),
                split_heads(v_new, n_heads), causal=True,
            )
            x = x + dense(sa["out_proj"], merge_heads(o))

        ea = lp["encoder_attn"]
        if "kv_proj" in ea:
            kv = dense(ea["kv_proj"], enc)
            ck_full, cv_full = jnp.split(kv, 2, axis=-1)
        else:
            ck_full = dense(ea["k_proj"], enc)
            cv_full = dense(ea["v_proj"], enc)

        if p > 1:
            h = layer_norm(lp["encoder_attn_layer_norm"], x, eps)
            q2 = dense(ea["q_proj"], h)
            o2 = attention(
                split_heads(q2, n_heads), split_heads(ck_full, n_heads),
                split_heads(cv_full, n_heads),
            )
            x = x + dense(ea["out_proj"], merge_heads(o2))
            h = layer_norm(lp["final_layer_norm"], x, eps)
            x = x + dense(
                lp["fc2"], jax.nn.gelu(dense(lp["fc1"], h), approximate=False)
            )

        # quantize + scatter this layer's KV into the donated window cache
        if quant:
            ckq, cks_l = q_cross(ck_full)
            cvq, cvs_l = q_cross(cv_full)
            ck = ck.at[l, idx].set(ckq)
            cv = cv.at[l, idx].set(cvq)
            cks = cks.at[l, idx].set(cks_l.astype(cks.dtype))
            cvs = cvs.at[l, idx].set(cvs_l.astype(cvs.dtype))
            if p > 1:
                skq, sks_l = q_self(k_new)
                svq, svs_l = q_self(v_new)
                sk = sk.at[l, idx[:, None], slots[None, :]].set(skq)
                sv = sv.at[l, idx[:, None], slots[None, :]].set(svq)
                sks = sks.at[l, idx[:, None], slots[None, :]].set(
                    sks_l.astype(sks.dtype)
                )
                svs = svs.at[l, idx[:, None], slots[None, :]].set(
                    svs_l.astype(svs.dtype)
                )
        else:
            ck = ck.at[l, idx].set(ck_full.astype(ck.dtype))
            cv = cv.at[l, idx].set(cv_full.astype(cv.dtype))
            if p > 1:
                sk = sk.at[l, idx[:, None], slots[None, :]].set(
                    k_new.astype(sk.dtype)
                )
                sv = sv.at[l, idx[:, None], slots[None, :]].set(
                    v_new.astype(sv.dtype)
                )
        return (x, sk, sv, ck, cv, sks, svs, cks, cvs), None

    # dummy scale carries when unquantized (scan carries must be arrays)
    z = jnp.zeros((cfg.decoder_layers,), jnp.float32)
    carry0 = (
        x0, cache.self_k, cache.self_v, cache.cross_k, cache.cross_v,
        cache.self_k_scale if quant else z,
        cache.self_v_scale if quant else z,
        cache.cross_k_scale if quant else z,
        cache.cross_v_scale if quant else z,
    )
    (_, sk, sv, ck, cv, sks, svs, cks, cvs), _ = jax.lax.scan(
        body, carry0,
        (dec["layers"], jnp.arange(cfg.decoder_layers)),
    )
    new_cache = cache._replace(
        self_k=sk, self_v=sv, cross_k=ck, cross_v=cv,
        length=cache.length.at[idx].set(p - 1),
        self_k_scale=sks if quant else None,
        self_v_scale=svs if quant else None,
        cross_k_scale=cks if quant else None,
        cross_v_scale=cvs if quant else None,
    )
    return pin_default_layout(StreamState(
        tokens=state.tokens.at[idx].set(pool_tokens),
        finished=state.finished.at[idx].set(~pool_valid),
        active=state.active.at[idx].set(pool_valid),
        stop=state.stop.at[idx].set(pool_stop),
        utt_id=state.utt_id.at[idx].set(pool_utt),
        ring=state.ring,
        cache=new_cache,
    ))


@partial(
    jax.jit,
    donate_argnums=(2,),
    static_argnames=("cfg", "opts", "compute_dtype", "attn_impl", "kv_dtype"),
)
def _refill_from_enc(
    params, cfg: WhisperConfig, state: StreamState, enc: jax.Array,
    pool_tokens, pool_stop, pool_utt, pool_valid, *,
    opts: GenerateOptions, compute_dtype, attn_impl, kv_dtype,
) -> StreamState:
    """Split-pipeline refill: consumes the (E*T, D)-flattened encoder
    output of _encode_only (see its layout note)."""
    e = pool_stop.shape[0]
    enc = enc.reshape(e, -1, enc.shape[-1])
    return _refill_impl(
        params, cfg, state, enc, pool_tokens, pool_stop, pool_utt,
        pool_valid, opts=opts, compute_dtype=compute_dtype,
        attn_impl=attn_impl, kv_dtype=kv_dtype,
    )


@partial(
    jax.jit,
    donate_argnums=(2,),
    static_argnames=("cfg", "opts", "compute_dtype", "attn_impl", "kv_dtype"),
)
def _encode_refill_fused(
    params, cfg: WhisperConfig, state: StreamState, mel: jax.Array,
    pool_tokens, pool_stop, pool_utt, pool_valid, *,
    opts: GenerateOptions, compute_dtype, attn_impl, kv_dtype,
) -> StreamState:
    """Fused encode+refill in one program (no cross-program enc handoff):
    the default path — this environment's remote plugin cannot relayout
    arrays handed between executables (StreamConfig.prefetch notes)."""
    enc = whisper.encode(
        params, cfg, mel.astype(compute_dtype),
        compute_dtype=compute_dtype, attn_impl=attn_impl,
    )
    return _refill_impl(
        params, cfg, state, enc, pool_tokens, pool_stop, pool_utt,
        pool_valid, opts=opts, compute_dtype=compute_dtype,
        attn_impl=attn_impl, kv_dtype=kv_dtype,
    )


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "opts", "special", "n_steps",
        "compute_dtype", "attn_impl", "kv_dtype",
    ),
    donate_argnums=(2,),  # state: in-place KV updates
)
def _steps(
    params, cfg: WhisperConfig, state: StreamState, opts: GenerateOptions,
    special: SpecialTokens, free_for, *, n_steps: int,
    compute_dtype, attn_impl, kv_dtype,
) -> StreamState:
    """Run up to n_steps shared-ring decode steps. The round ends ON
    DEVICE as soon as at least `free_for` rows are free (finished or
    inactive) — i.e. exactly when the host has a refill to perform — or
    when every row is finished. This makes host round-trips proportional
    to refills instead of a fixed step cadence (each sync is a real
    latency cost on remote-attached chips). `free_for` is traced: pass
    w+1 to drain to completion without recompiling.

    Each step: feed every row its token at index `count` (prompt token
    during replay, last sampled otherwise), write K/V at the shared ring
    slot, take the rule-masked argmax, and keep the existing token
    instead wherever the row is still replaying its prompt or already
    finished."""
    rc = opts.rule_config(special)
    pad = cfg.pad_token_id
    eot = special.eot
    p = len(opts.prompt_ids)
    cap = opts.max_length
    w = state.tokens.shape[0]
    rows = jnp.arange(w)

    def cond(carry):
        i, st = carry
        n_free = jnp.sum(st.finished | ~st.active)
        return (i < n_steps) & ~jnp.all(st.finished) & (n_free < free_for)

    def body(carry):
        i, st = carry
        was_finished = st.finished
        # feed the token at index `count` (the next unprocessed token);
        # frozen finished rows can sit at count == cap — clamp the gather
        last = st.tokens[rows, jnp.minimum(st.cache.length, cap - 1)][:, None]
        logits, cache = whisper.decode(
            params, cfg, last, cache=st.cache, ring_pos=st.ring,
            compute_dtype=compute_dtype, attn_impl=attn_impl,
        )
        count = cache.length  # per-row token count after this step
        masked = apply_rules(
            logits[:, 0].astype(jnp.float32), st.tokens, count, rc
        )
        nxt = jnp.argmax(masked, axis=-1).astype(jnp.int32)
        # replay: while the predicted index still lies inside the prompt,
        # the "prediction" is the stored prompt token
        in_replay = count < p
        cur = st.tokens[rows, jnp.minimum(count, cap - 1)]
        keep = was_finished | in_replay
        eff = jnp.where(keep, cur, nxt)
        tokens = st.tokens.at[rows, jnp.minimum(count, cap - 1)].set(eff)
        finished = was_finished | (
            ~in_replay & ((eff == eot) | (count + 1 >= st.stop))
        )
        # freeze finished rows' count (their step re-wrote only the shared
        # ring slot, which the age mask will hide once they are refilled)
        cache = cache._replace(
            length=jnp.where(was_finished, st.cache.length, count)
        )
        return i + 1, StreamState(
            tokens, finished, st.active, st.stop, st.utt_id,
            jnp.mod(st.ring + 1, cap), cache,
        )

    _, state = jax.lax.while_loop(cond, body, (jnp.asarray(0), state))
    return pin_default_layout(state)


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
    token count (used by the realistic-length bench).

    Device residency contract: a numpy `mels` is uploaded in slabs of
    `stream.source_windows` (padded on host, so no fp32 device transient),
    bounding HBM use for arbitrary N; a jax.Array `mels` is used whole —
    the caller has already placed it and owns its footprint."""
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
    pool_tokens = jnp.asarray(
        np.asarray(_prompt_tokens(opts, cfg.pad_token_id, e))
    )

    # Keep the mel source ON DEVICE: per-refill host->device uploads sit on
    # the dispatch path and, on remote-attached TPUs, on the host tunnel —
    # measured as the dominant cost of the whole stream in bench r2. A
    # device-resident source makes each refill a pure device slice. Host
    # (numpy) sources are padded ON HOST (no device fp32 pad transient)
    # and uploaded in source_windows-sized slabs so unbounded N stays
    # HBM-safe; slab uploads amortize over slab/e refills.
    n_pad = n if n % e == 0 else n + (e - n % e)
    if isinstance(mels, jax.Array):
        if n % e:
            mels = jnp.pad(mels, ((0, n_pad - n), (0, 0), (0, 0)))
        mels_host, slab_size = None, n_pad
        mels_dev, slab_lo = mels, 0
    else:
        mels_host = np.asarray(mels)
        if n % e:
            mels_host = np.pad(
                mels_host, ((0, n_pad - n), (0, 0), (0, 0))
            )
        slab_size = max(stream.source_windows - stream.source_windows % e, e)
        mels_dev, slab_lo = jnp.asarray(mels_host[:slab_size]), 0

    pending: tuple[int, jax.Array] | None = None  # (lo, enc) prefetch

    def encode_slice(lo):
        return _encode_only(
            params, cfg, mel_slice(lo),
            compute_dtype=compute_dtype, attn_impl=attn_impl,
        )

    def mel_slice(lo):
        nonlocal mels_dev, slab_lo
        if lo - slab_lo >= slab_size:  # advance to the next source slab
            slab_lo = lo - lo % slab_size
            mels_dev = jnp.asarray(
                mels_host[slab_lo : slab_lo + slab_size]
            )
        return jax.lax.dynamic_slice_in_dim(
            mels_dev, lo - slab_lo, e, axis=0
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
                params, cfg, state, enc, *meta, opts=opts, **kw,
            )
        return _encode_refill_fused(
            params, cfg, state, mel_slice(lo), *meta, opts=opts, **kw,
        )

    # Host-side phase accounting (KWT_STREAM_TRACE=1): dispatch time per
    # phase plus the device_get sync (which absorbs all device time of the
    # round) — decomposes the loop without adding fences.
    trace = os.environ.get("KWT_STREAM_TRACE", "0") != "0"
    acc = {"steps": 0.0, "sync": 0.0, "harvest": 0.0, "refill": 0.0,
           "rounds": 0, "refills": 0}

    def timed(key, fn, *a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        acc[key] += time.perf_counter() - t0
        return out

    # initial fill: as many pool batches as fit in the window
    filled = 0
    while next_utt < n and filled + e <= w:
        state = timed("refill", refill_once, state)
        acc["refills"] += 1
        filled += e

    while len(results) < n:
        acc["rounds"] += 1
        # end the round on-device exactly when a refill becomes possible;
        # once the stream is drained, run to completion (w+1 never trips)
        want = e if next_utt < n else w + 1
        state = timed(
            "steps", _steps, params, cfg, state, opts, special,
            jnp.asarray(want, jnp.int32),
            n_steps=stream.steps_per_round, **kw,
        )
        # speculative encode of the next pool slice, queued on-device
        # BEHIND the round: keeps the chip busy through the host sync
        # round trip below (refill order is deterministic, so the slice
        # is always the one the next refill will want)
        if stream.prefetch and next_utt < n and pending is None:
            pending = (next_utt, timed("refill", encode_slice, next_utt))
        tokens, finished, active, utt_id = timed(
            "sync", jax.device_get,
            (state.tokens, state.finished, state.active, state.utt_id),
        )
        t0 = time.perf_counter()
        for r in np.nonzero(finished & active)[0]:
            uid = int(utt_id[r])
            if uid >= 0 and uid not in results:
                results[uid] = tokens[r].copy()
        n_free = int(np.sum(finished | ~active))
        acc["harvest"] += time.perf_counter() - t0
        while next_utt < n and n_free >= e:
            state = timed("refill", refill_once, state)
            acc["refills"] += 1
            n_free -= e

    if trace:
        import json as _json
        import sys as _sys

        print("KWT_STREAM_TRACE " + _json.dumps(
            {k: round(v, 3) if isinstance(v, float) else v
             for k, v in acc.items()}
        ), file=_sys.stderr)
    return np.stack([results[i] for i in range(n)])
