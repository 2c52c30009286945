"""Checkpoint tests: orbax save/restore round-trip, rotation/resume
semantics, and the HF-layout export/import (reference format parity via
torch load of the exported safetensors)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kotoba_whisper_tpu.models import whisper
from kotoba_whisper_tpu.train import checkpoint, distill, optim
from tests.test_train import tiny_cfg


def _state(seed=0):
    cfg = tiny_cfg()
    params = whisper.init_params(jax.random.key(seed), cfg)
    tx, _ = optim.make_optimizer(params, lr=1e-3, warmup_steps=1)
    return cfg, distill.init_train_state(params, tx)


def test_train_state_roundtrip(tmp_path):
    cfg, state = _state()
    state = state._replace(step=jnp.asarray(7, jnp.int32))
    path = checkpoint.save_train_state(str(tmp_path), state, epoch=2)
    assert path.endswith("checkpoint-7-epoch-2")

    _, abstract = _state(seed=1)  # different values, same structure
    restored = checkpoint.load_train_state(path, abstract)
    assert int(restored.step) == 7
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_rotation_and_resume(tmp_path):
    cfg, state = _state()
    for step, epoch in [(10, 0), (20, 1), (30, 1), (40, 2)]:
        s = state._replace(step=jnp.asarray(step, jnp.int32))
        checkpoint.save_train_state(str(tmp_path), s, epoch, save_total_limit=2)
    names = [p.split("/")[-1] for p in checkpoint.sorted_checkpoints(str(tmp_path))]
    assert names == ["checkpoint-30-epoch-1", "checkpoint-40-epoch-2"]
    last = checkpoint.get_last_checkpoint(str(tmp_path))
    assert last is not None
    _, step, epoch = last
    assert (step, epoch) == (40, 2)


def test_hf_export_import_roundtrip(tmp_path):
    cfg, state = _state()
    out = str(tmp_path / "model")
    checkpoint.export_hf_model(out, state.params, cfg)
    params2, cfg2 = checkpoint.import_hf_model(out)
    assert cfg2.d_model == cfg.d_model
    for x, y in zip(jax.tree.leaves(state.params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)


def test_export_loads_in_torch_hf(tmp_path):
    """The exported safetensors + config load into HF transformers and
    produce identical logits — true format-level parity with the artifact
    the reference ecosystem consumes."""
    torch = pytest.importorskip("torch")
    trf = pytest.importorskip("transformers")
    cfg, state = _state()
    out = str(tmp_path / "model")
    checkpoint.export_hf_model(out, state.params, cfg)

    hf_model = trf.WhisperForConditionalGeneration.from_pretrained(out).eval()
    rng = np.random.default_rng(0)
    mel = rng.standard_normal(
        (1, cfg.num_mel_bins, 2 * cfg.max_source_positions)
    ).astype(np.float32)
    ids = rng.integers(0, cfg.vocab_size, (1, 6)).astype(np.int64)
    with torch.no_grad():
        golden = hf_model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(ids),
        ).logits.numpy()
    ours, _ = whisper.forward(state.params, cfg, jnp.asarray(mel), jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), golden, atol=2e-4, rtol=1e-3)
