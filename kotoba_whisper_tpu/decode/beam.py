"""Beam-search generation with KV cache, static shapes, lax.while_loop.

TPU-native equivalent of `generate(num_beams=N)` at
run_pseudo_labelling.py:302-311,338, matching transformers' vectorized
`GenerationMixin._beam_search` semantics TOKEN-EXACTLY (verified against
HF generate in tests/test_beam_parity.py). The behavioral contract:

- per-step scores are log_softmax of the RAW logits, with the logits
  rules applied to the log-probs afterwards — no renormalization over the
  unmasked set (HF applies processors after log_softmax);
- top 2K candidates over the flattened (K*V) space; a candidate "hits
  stopping" when it emits <|endoftext|> OR the sequence reaches
  max_length (HF's MaxLengthCriteria force-finalizes every candidate at
  the final step);
- only candidates ranked < K may enter the finished set
  (`top_num_beam_mask`), scored sum_logprobs / (generated_len **
  length_penalty); the finished set keeps the best K by penalized score;
- stopping-hit candidates get -1e9 ADDED for the alive top-K (HF's exact
  arithmetic, kept for tie parity);
- early_stopping=False heuristic: once a batch row's best running score /
  ((cur_len - prompt_len) ** penalty) can no longer beat its worst
  finished score, the row stops ACCEPTING new finished hypotheses (and
  the loop ends when every row is in that state).

Layout notes (TPU-first):
  - beams live in the batch axis: (B, K, ...) flattened to (B*K, ...) for
    the model step, so the decoder kernel is identical to greedy;
  - beam reorder = one gather on the cache's batch axis — when the model is
    sharded over the mesh's model axis this gather stays local because the
    cache batch axis is sharded on data only;
  - timestamp/suppress rules (decode/logits_rules.py) are applied per beam
    before scoring, exactly as in greedy.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from kotoba_whisper_tpu.core.config import SpecialTokens, WhisperConfig
from kotoba_whisper_tpu.decode.greedy import GenerateOptions
from kotoba_whisper_tpu.decode.logits_rules import apply_rules
from kotoba_whisper_tpu.models import whisper

NEG_INF = -1.0e9  # HF's exact sentinel (matters for tie/score parity)


def _flatten_beams(x):
    return x.reshape((-1,) + x.shape[2:])


def _unflatten_beams(x, b, k):
    return x.reshape((b, k) + x.shape[1:])


def _gather_beams(x, beam_indices, b):
    """x: (B, K_old, ...), beam_indices: (B, K_new) -> (B, K_new, ...)."""
    return jax.vmap(lambda rows, idx: rows[idx])(x, beam_indices)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "opts", "special", "num_beams", "compute_dtype", "attn_impl",
        "kv_dtype",
    ),
)
def generate_beam(
    params,
    cfg: WhisperConfig,
    input_features: jax.Array,
    opts: GenerateOptions,
    special: SpecialTokens,
    num_beams: int = 5,
    length_penalty: float = 1.0,
    *,
    compute_dtype=jnp.float32,
    attn_impl: str = "xla",
    kv_dtype: str = "compute",
) -> tuple[jax.Array, jax.Array]:
    """(B, n_mels, T) -> (tokens (B, max_length), scores (B,)).

    Returns the best hypothesis per row (finished if any finished, else the
    best alive beam), with its length-penalized log-prob score.
    """
    b = input_features.shape[0]
    k = num_beams
    p = len(opts.prompt_ids)
    max_len = opts.max_length
    rc = opts.rule_config(special)
    pad = cfg.pad_token_id
    eot = special.eot

    encoder_out = whisper.encode(
        params, cfg, input_features,
        compute_dtype=compute_dtype, attn_impl=attn_impl,
    )
    # cross-KV is hypothesis-independent: build it once per GROUP and let
    # decode(beam_size=k) fan each group's beam queries over it — the
    # per-step cross-KV HBM stream (the dominant beam decode cost) and
    # the cache footprint shrink by k vs the replicated layout, and the
    # beam reorder below never touches cross-KV
    cache = whisper.init_cache(
        params, cfg, encoder_out, capacity=max_len,
        compute_dtype=compute_dtype, kv_dtype=kv_dtype, beam_size=k,
    )

    tokens = jnp.full((b, k, max_len), pad, jnp.int32)
    tokens = tokens.at[:, :, :p].set(jnp.asarray(opts.prompt_ids, jnp.int32))

    if p > 1:
        _, cache = whisper.decode(
            params, cfg, _flatten_beams(tokens)[:, : p - 1], cache=cache,
            compute_dtype=compute_dtype, attn_impl=attn_impl, beam_size=k,
        )

    # only beam 0 is live initially (all beams identical -> avoid dup hyps)
    alive_logp = jnp.tile(
        jnp.asarray([0.0] + [NEG_INF] * (k - 1), jnp.float32), (b, 1)
    )
    fin_tokens = jnp.full((b, k, max_len), pad, jnp.int32)
    fin_scores = jnp.full((b, k), NEG_INF, jnp.float32)
    fin_exists = jnp.zeros((b, k), bool)

    def length_pen(cur_len):
        # HF: score = sum_logprobs / (generated_len ** penalty); generated
        # length counts tokens after the prompt, including the final token
        gen_len = (cur_len + 1 - p).astype(jnp.float32)
        return jnp.maximum(gen_len, 1.0) ** length_penalty

    unsat = jnp.ones((b,), bool)  # early-stop heuristic still unsatisfied

    def cond(state):
        tokens, cache, alive_logp, fins, unsat, cur_len = state
        # valid_continuations (cur_len < max_len) & improvement_possible
        return (cur_len < max_len) & jnp.any(unsat)

    def body(state):
        tokens, cache, alive_logp, fins, unsat, cur_len = state
        fin_tokens, fin_scores, fin_exists = fins

        flat_tokens = _flatten_beams(tokens)
        last = jax.lax.dynamic_slice_in_dim(flat_tokens, cur_len - 1, 1, axis=1)
        logits, new_cache = whisper.decode(
            params, cfg, last, cache=cache,
            compute_dtype=compute_dtype, attn_impl=attn_impl, beam_size=k,
        )
        # HF order: log_softmax FIRST, rules on the log-probs (no
        # renormalization over the unmasked set)
        logp_step = apply_rules(
            jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1),
            flat_tokens, cur_len, rc,
        )
        v = logp_step.shape[-1]
        logp = _unflatten_beams(logp_step, b, k) + alive_logp[..., None]

        # top 2K over flattened beam*vocab
        flat = logp.reshape(b, k * v)
        top_logp, top_idx = jax.lax.top_k(flat, 2 * k)
        top_beam = top_idx // v          # (B, 2K)
        top_tok = top_idx % v

        # grow candidate sequences
        cand_tokens = _gather_beams(tokens, top_beam, b)  # (B, 2K, L)
        cand_tokens = jax.lax.dynamic_update_slice_in_dim(
            cand_tokens, top_tok[..., None].astype(jnp.int32), cur_len, axis=2
        )
        # stopping hit: eot, or the sequence just reached max_length
        # (HF's MaxLengthCriteria force-finalizes the last step)
        hits = (top_tok == eot) | (cur_len + 1 >= max_len)

        # --- finished set update (HF _update_finished_beams) ---
        # only ranks < K are eligible, and only while the row's early-stop
        # heuristic is unsatisfied
        top_num_beam = jnp.arange(2 * k)[None, :] < k
        eligible = hits & top_num_beam & unsat[:, None]
        cand_fin_scores = jnp.where(
            eligible, top_logp / length_pen(cur_len), NEG_INF
        )
        all_fin_scores = jnp.concatenate([fin_scores, cand_fin_scores], axis=1)
        all_fin_tokens = jnp.concatenate([fin_tokens, cand_tokens], axis=1)
        all_fin_exists = jnp.concatenate([fin_exists, eligible], axis=1)
        fin_top, fin_idx = jax.lax.top_k(all_fin_scores, k)
        fin_tokens = _gather_beams(all_fin_tokens, fin_idx, b)
        fin_scores = fin_top
        fin_exists = jnp.take_along_axis(all_fin_exists, fin_idx, axis=1)

        # --- alive set update: HF ADDS -1e9 to stopping-hit candidates ---
        alive_cand = top_logp + hits.astype(jnp.float32) * NEG_INF
        alive_top, alive_idx = jax.lax.top_k(alive_cand, k)
        new_tokens = _gather_beams(cand_tokens, alive_idx, b)
        alive_beam = jnp.take_along_axis(top_beam, alive_idx, axis=1)

        # reorder cache to the selected beams' histories (gather on the
        # flattened batch*beam axis)
        flat_beam_index = (
            alive_beam + jnp.arange(b)[:, None] * k
        ).reshape(-1)
        new_cache = whisper.KVCache(
            new_cache.self_k[:, flat_beam_index],
            new_cache.self_v[:, flat_beam_index],
            new_cache.cross_k,
            new_cache.cross_v,
            new_cache.length,
            None if new_cache.self_k_scale is None
            else new_cache.self_k_scale[:, flat_beam_index],
            None if new_cache.self_v_scale is None
            else new_cache.self_v_scale[:, flat_beam_index],
            new_cache.cross_k_scale,
            new_cache.cross_v_scale,
        )

        # --- early-stop heuristic (HF _check_early_stop_heuristic,
        # early_stopping=False): best running score at the NEW length vs
        # the row's worst finished slot; sticky once satisfied ---
        new_len = cur_len + 1
        best_possible = alive_top[:, 0] / jnp.maximum(
            (new_len - p).astype(jnp.float32), 1.0
        ) ** length_penalty
        worst = jnp.where(
            fin_exists, jnp.min(fin_scores, axis=1, keepdims=True), NEG_INF
        )  # (B, K): -1e9 wherever a slot is still unfinished
        unsat = unsat & jnp.any(best_possible[:, None] > worst, axis=1)

        return (
            new_tokens,
            new_cache,
            alive_top,
            (fin_tokens, fin_scores, fin_exists),
            unsat,
            new_len,
        )

    state = (
        tokens, cache, alive_logp,
        (fin_tokens, fin_scores, fin_exists),
        unsat,
        jnp.asarray(p, jnp.int32),
    )
    tokens, _, alive_logp, fins, _, cur_len = jax.lax.while_loop(
        cond, body, state
    )
    fin_tokens, fin_scores, fin_exists = fins

    # fin_scores is top_k-sorted descending; slot 0 is the best finished
    # hypothesis. The max-length force-finalization guarantees existence
    # whenever the loop ran to the end; the alive fallback only covers the
    # degenerate heuristic-stop-before-any-finish case.
    any_fin = jnp.any(fin_exists, axis=1)
    best_alive_idx = jnp.argmax(alive_logp, axis=1)
    alive_scores = alive_logp / length_pen(cur_len - 1)
    out_tokens = jnp.where(
        any_fin[:, None],
        fin_tokens[:, 0],
        jnp.take_along_axis(tokens, best_alive_idx[:, None, None], axis=1)[:, 0],
    )
    out_scores = jnp.where(
        any_fin,
        fin_scores[:, 0],
        jnp.take_along_axis(alive_scores, best_alive_idx[:, None], axis=1)[:, 0],
    )
    return out_tokens, out_scores
