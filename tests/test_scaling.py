"""Scaling harness test on the virtual CPU mesh: the report machinery runs
sharded programs at 1..8 devices and produces well-formed efficiency rows
(absolute numbers are meaningless on CPU; shape/pathway is what's tested)."""
import jax
import jax.numpy as jnp
import numpy as np

from kotoba_whisper_tpu.eval.scaling import scaling_report
from kotoba_whisper_tpu.models import whisper
from tests.test_train import tiny_cfg


def test_scaling_report_runs():
    cfg = tiny_cfg()
    params = whisper.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)

    def make_pipeline(mesh):
        from kotoba_whisper_tpu.parallel import sharded

        p = sharded.place_params(mesh, params)

        @jax.jit
        def fn(batch):
            return whisper.encode(p, cfg, batch["mel"])

        return fn

    def make_batch(n_devices):
        return {
            "mel": np.asarray(
                rng.standard_normal(
                    (2 * n_devices, cfg.num_mel_bins, 2 * cfg.max_source_positions)
                ),
                np.float32,
            )
        }

    points = scaling_report(
        make_pipeline, make_batch, audio_seconds_per_item=30.0,
        device_counts=[1, 2, 4], n_trials=1,
    )
    assert [p.n_devices for p in points] == [1, 2, 4]
    assert points[0].efficiency == 1.0
    for p in points:
        assert p.audio_s_per_s > 0
