"""Checkpoint / resume / rotation.

Reference behaviors reproduced (SURVEY.md §5.4):
  (a) trainer state: params + optimizer state + step saved to
      `checkpoint-{step}-epoch-{epoch}` dirs via Orbax (sharding-aware, the
      accelerate `save_state` equivalent, run_distillation.py:760-763),
      with `save_total_limit` rotation of sorted checkpoints (:312-341)
      and regex-based resume detection (:344-356).
  (b) model export: HF-layout state dict (safetensors when available,
      npz fallback) + config.json so reference-stack consumers can load
      distilled students (save_pretrained, run_distillation.py:511-514).
"""
from __future__ import annotations

import dataclasses
import json
import os
import re
import shutil
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from kotoba_whisper_tpu.core.config import WhisperConfig
from kotoba_whisper_tpu.models.hf_import import hf_state_dict_from_params

_CKPT_RE = re.compile(r"^checkpoint-(\d+)-epoch-(\d+)$")


def checkpoint_name(step: int, epoch: int) -> str:
    return f"checkpoint-{step}-epoch-{epoch}"


def sorted_checkpoints(output_dir: str) -> list[str]:
    """Existing checkpoint dirs sorted by step (run_distillation.py:312-327)."""
    found = []
    if not os.path.isdir(output_dir):
        return []
    for name in os.listdir(output_dir):
        m = _CKPT_RE.match(name)
        if m and os.path.isdir(os.path.join(output_dir, name)):
            found.append((int(m.group(1)), name))
    return [os.path.join(output_dir, n) for _, n in sorted(found)]


def rotate_checkpoints(output_dir: str, save_total_limit: int | None) -> None:
    """Delete oldest checkpoints beyond the limit (:329-341)."""
    if save_total_limit is None or save_total_limit <= 0:
        return
    ckpts = sorted_checkpoints(output_dir)
    for path in ckpts[: max(0, len(ckpts) - save_total_limit)]:
        shutil.rmtree(path, ignore_errors=True)


def get_last_checkpoint(output_dir: str) -> tuple[str, int, int] | None:
    """(path, step, epoch) of the newest checkpoint, or None (:344-356)."""
    ckpts = sorted_checkpoints(output_dir)
    if not ckpts:
        return None
    name = os.path.basename(ckpts[-1])
    m = _CKPT_RE.match(name)
    assert m
    return ckpts[-1], int(m.group(1)), int(m.group(2))


def save_train_state(
    output_dir: str,
    state: Any,
    epoch: int,
    save_total_limit: int | None = None,
) -> str:
    """Save (params, opt_state, step) to checkpoint-{step}-epoch-{epoch}."""
    step = int(state.step)
    path = os.path.abspath(os.path.join(output_dir, checkpoint_name(step, epoch)))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.join(path, "state"),
        {"params": state.params, "opt_state": state.opt_state,
         "step": state.step},
        force=True,
    )
    ckptr.wait_until_finished()
    rotate_checkpoints(output_dir, save_total_limit)
    return path


def load_train_state(path: str, abstract_state: Any) -> Any:
    """Restore into the TrainState structure of `abstract_state`."""
    ckptr = ocp.StandardCheckpointer()
    target = {
        "params": abstract_state.params,
        "opt_state": abstract_state.opt_state,
        "step": abstract_state.step,
    }
    restored = ckptr.restore(os.path.join(os.path.abspath(path), "state"), target)
    return type(abstract_state)(
        restored["params"], restored["opt_state"], restored["step"]
    )


# ---------------------------------------------------------------------------
# HF-layout model export / import
# ---------------------------------------------------------------------------

def export_hf_model(
    path: str,
    params: Any,
    cfg: WhisperConfig,
    generation_defaults: dict | None = None,
) -> None:
    os.makedirs(path, exist_ok=True)
    sd = hf_state_dict_from_params(jax.device_get(params), cfg)
    cfg_dict = dataclasses.asdict(cfg)
    cfg_dict["model_type"] = "whisper"
    cfg_dict["architectures"] = ["WhisperForConditionalGeneration"]
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg_dict, f, indent=2)
    # generation_config.json: decode defaults travel with the checkpoint
    # (save_pretrained saves it too; cli/common.load_generation_defaults
    # reads it back)
    from kotoba_whisper_tpu.core.config import SpecialTokens

    st = SpecialTokens.for_vocab(cfg.vocab_size) if cfg.vocab_size >= 51865 else None
    gen = {
        "decoder_start_token_id": cfg.decoder_start_token_id,
        "eos_token_id": cfg.eos_token_id,
        "pad_token_id": cfg.pad_token_id,
        "max_length": cfg.max_target_positions,
        "max_initial_timestamp_index": 50,
        "return_timestamps": True,
    }
    if st is not None:
        gen["no_timestamps_token_id"] = st.no_timestamps
        # language/task forcing maps: HF generate(language=..., task=...)
        # resolves through generation_config.lang_to_id / task_to_id
        # (real whisper checkpoints ship these; required for
        # cli/parity_check's cross-stack greedy comparison)
        from kotoba_whisper_tpu.tokenizer.whisper_tokenizer import (
            LANG_TO_INDEX,
        )

        gen["is_multilingual"] = True
        gen["lang_to_id"] = {
            f"<|{code}|>": st.lang_begin + idx
            for code, idx in LANG_TO_INDEX.items()
            if idx < st.n_langs
        }
        gen["task_to_id"] = {
            "transcribe": st.transcribe, "translate": st.translate,
        }
    if generation_defaults:
        gen.update(generation_defaults)
    with open(os.path.join(path, "generation_config.json"), "w") as f:
        json.dump(gen, f, indent=2)
    try:
        from safetensors.numpy import save_file

        # tied proj_out must not be serialized twice in safetensors
        sd = {k: v for k, v in sd.items() if k != "proj_out.weight"}
        save_file(sd, os.path.join(path, "model.safetensors"))
    except ImportError:
        np.savez(os.path.join(path, "model.npz"), **sd)


def import_hf_model(path: str):
    """Load an export (or a real HF checkpoint dir) back into a pytree."""
    from kotoba_whisper_tpu.models.hf_import import (
        config_from_hf_dict,
        params_from_hf_state_dict,
    )

    with open(os.path.join(path, "config.json")) as f:
        cfg = config_from_hf_dict(json.load(f))
    st_path = os.path.join(path, "model.safetensors")
    npz_path = os.path.join(path, "model.npz")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        sd = load_file(st_path)
    else:
        sd = dict(np.load(npz_path))
    return params_from_hf_state_dict(sd, cfg), cfg
