"""Auxiliary subsystem tests: downloader retry/health-check (file:// URLs),
chunk merger + status audit, statistics (param-count parity with the
reference's published numbers), timestamp repair, cascaded S2T, profiling
timer, multihost helpers."""
import os

import numpy as np
import pytest

from kotoba_whisper_tpu.data import downloader, merge, reazon
from kotoba_whisper_tpu.eval.statistics import data_statistics, model_statistics
from kotoba_whisper_tpu.eval.timestamp_repair import repair_timestamps


def test_downloader_retry_and_health_check(tmp_path, rng):
    # serve shards from a local "remote" dir via file:// URLs
    remote = tmp_path / "remote"
    remote.mkdir()
    for i in range(3):
        reazon.write_tar_shard(
            str(remote / f"{i:03x}.tar"), [(f"u{i}.wav", b"RIFFxxxx")]
        )
    (remote / "transcript.tsv").write_text("u0.wav\thello\n")

    out = tmp_path / "local"
    cfg = downloader.DownloadConfig(
        base_url=f"file://{remote}", out_dir=str(out), n_shards=3,
        n_workers=2, max_retries=2, retry_sleep_s=0.01,
    )
    still_broken = downloader.download_dataset(cfg)
    assert still_broken == []
    assert downloader.health_check(cfg) == []
    assert sorted(os.listdir(out)) == ["000.tar", "001.tar", "002.tar", "transcript.tsv"]

    # corrupt one shard -> health check flags it; re-download heals it
    (out / "001.tar").write_bytes(b"corrupt")
    assert downloader.health_check(cfg) == [1]
    assert downloader.download_dataset(cfg) == []
    assert downloader.health_check(cfg) == []

    # missing remote shard stays broken after retries
    os.remove(remote / "002.tar")
    os.remove(out / "002.tar")
    assert downloader.download_dataset(cfg) == [2]


def test_merge_chunks_and_status(tmp_path):
    from kotoba_whisper_tpu.cli.common import read_jsonl, write_jsonl

    chunk_dirs = []
    for i in range(4):
        d = tmp_path / f"chunk_{i}" / "filtered"
        d.mkdir(parents=True)
        write_jsonl(str(d / "filtered.jsonl"),
                    iter([{"name": f"c{i}", "labels": [1, 2]}]))
        np.savez(str(d / "features.npz"),
                 input_features=np.full((1, 4, 8), i, np.float16))
        chunk_dirs.append(str(d))

    splits = merge.merge_chunks(chunk_dirs, str(tmp_path / "merged"),
                                chunks_per_split=3, shard_size=2)
    assert len(splits) == 2
    rows0 = read_jsonl(os.path.join(splits[0], "filtered.jsonl"))
    assert [r["name"] for r in rows0] == ["c0", "c1", "c2"]
    # sharded mmap layout: 3 utts at shard_size=2 -> shards of 2 + 1
    from kotoba_whisper_tpu.data.shards import FeatureStore

    store = FeatureStore(splits[0])
    assert store.index["shard_sizes"] == [2, 1]
    f0 = store.gather(np.arange(3))
    assert f0.shape == (3, 4, 8) and f0.dtype == np.float16
    np.testing.assert_array_equal(f0[:, 0, 0], [0, 1, 2])
    # out-of-order gather crosses shards correctly
    np.testing.assert_array_equal(store.gather([2, 0])[:, 0, 0], [2, 0])

    status = merge.chunk_status(str(tmp_path), 6)
    assert status["done"] == [0, 1, 2, 3]
    assert status["missing"] == [4, 5]


def test_model_statistics_match_reference_param_counts():
    """Parameter counts must reproduce misc/model_statistics.csv exactly:
    large-v3 = 1,543,490,560; kotoba-v1.0 student (large-v3 arch, 2 decoder
    layers) = 756,405,760."""
    import jax

    from kotoba_whisper_tpu.core.config import PRESETS
    from kotoba_whisper_tpu.models import whisper

    def abstract_count(cfg):
        shapes = jax.eval_shape(
            lambda k: whisper.init_params(k, cfg), jax.random.key(0)
        )
        return whisper.param_count(shapes)

    assert abstract_count(PRESETS["large-v3"]) == 1_543_490_560
    # kotoba-v1.0 student = large-v3 architecture with 2 decoder layers
    assert abstract_count(PRESETS["distil-large-v3"]) == 756_405_760


def test_data_statistics(rng):
    utts = [
        (rng.standard_normal(16000).astype(np.float32), [1, 2, 3]),
        (rng.standard_normal(32000).astype(np.float32), [1]),
    ]
    s = data_statistics(iter(utts))
    assert s["num_utterances"] == 2
    assert s["duration_s_total"] == pytest.approx(3.0)
    assert s["token_length_mean"] == 2.0


def test_repair_timestamps():
    chunks = [
        {"timestamp": (0.0, 2.0), "text": "a"},
        {"timestamp": (None, None), "text": "b"},
        {"timestamp": (3.5, None), "text": "c"},
    ]
    fixed = repair_timestamps(chunks, audio_duration_s=10.0)
    assert fixed[1]["timestamp"][0] == 2.0
    assert fixed[1]["timestamp"][1] == 3.5
    starts = [c["timestamp"][0] for c in fixed]
    ends = [c["timestamp"][1] for c in fixed]
    assert all(s <= e for s, e in zip(starts, ends))
    assert all(ends[i] <= starts[i + 1] or starts[i + 1] >= ends[i]
               for i in range(len(fixed) - 1))


def test_cascaded_s2t(rng):
    from kotoba_whisper_tpu.eval.cascaded_s2t import CascadedS2TPipeline

    class FakeAsr:
        def __call__(self, audio):
            return {"text": "こんにちは", "chunks": []}

    pipe = CascadedS2TPipeline(
        asr=FakeAsr(), translate_fn=lambda s: f"<en>{s}</en>"
    )
    out = pipe(np.zeros(16000, np.float32))
    assert out["text"] == "<en>こんにちは</en>"
    assert out["source_text"] == "こんにちは"


def test_multihost_single_process_helpers():
    from kotoba_whisper_tpu.parallel import multihost as mh

    assert mh.process_count() == 1
    assert mh.is_main_process()
    mh.barrier()  # no-op
    x = np.arange(6).reshape(2, 3)
    np.testing.assert_array_equal(mh.all_gather_host(x), x)
    assert mh.shard_for_host([1, 2, 3]) == [1, 2, 3]
    assert list(mh.interleave_prefetch(iter(range(5)))) == [0, 1, 2, 3, 4]


def test_step_timer():
    import jax.numpy as jnp

    from kotoba_whisper_tpu.utils.profiling import StepTimer

    t = StepTimer()
    with t:
        y = jnp.ones((8, 8)) * 2
        dt = t.done(y)
    assert dt > 0 and t.mean > 0


def test_safe_publish_atomic(tmp_path):
    from kotoba_whisper_tpu.utils.artifacts import (
        delete_artifacts,
        list_artifacts,
        safe_publish,
    )

    dest = str(tmp_path / "store" / "dataset_v1")

    def build(d):
        with open(os.path.join(d, "data.txt"), "w") as f:
            f.write("v1")

    safe_publish(build, dest)
    assert open(os.path.join(dest, "data.txt")).read() == "v1"

    # republish replaces atomically
    def build2(d):
        with open(os.path.join(d, "data.txt"), "w") as f:
            f.write("v2")

    safe_publish(build2, dest)
    assert open(os.path.join(dest, "data.txt")).read() == "v2"

    # failing build retries then raises; dest untouched
    import pytest as _pytest

    def bad(d):
        raise OSError("disk on fire")

    with _pytest.raises(RuntimeError):
        safe_publish(bad, dest, max_retries=2, retry_sleep_s=0.01)
    assert open(os.path.join(dest, "data.txt")).read() == "v2"

    assert list_artifacts(str(tmp_path / "store")) == ["dataset_v1"]
    delete_artifacts(str(tmp_path / "store"), ["dataset_v1"])
    assert list_artifacts(str(tmp_path / "store")) == []


def test_debug_utilities():
    import jax.numpy as jnp

    from kotoba_whisper_tpu.utils.debug import (
        assert_params_in_sync,
        find_nonfinite,
        tree_checksum,
    )

    tree = {"a": jnp.ones((4, 4)), "b": {"c": jnp.full((2,), 2.0)}}
    cs = tree_checksum(tree)
    assert cs == pytest.approx(20.0)
    assert assert_params_in_sync(tree) == pytest.approx(20.0)
    tree["b"]["c"] = jnp.asarray([jnp.nan, 1.0])
    bad = find_nonfinite(tree)
    assert len(bad) == 1 and "c" in bad[0]


def test_metric_logger_and_throughput(tmp_path):
    import json as _json
    import time as _time

    from kotoba_whisper_tpu.train.logging import MetricLogger, Throughput

    logger = MetricLogger(str(tmp_path), run_name="t")
    logger.log({"loss": 1.5, "ce_loss": 1.0}, step=10)
    logger.log({"loss": 1.2}, step=20, prefix="eval")
    logger.close()
    rows = [
        _json.loads(l) for l in open(tmp_path / "metrics.t.jsonl")
    ]
    assert rows[0]["train/loss"] == 1.5 and rows[0]["step"] == 10
    assert rows[1]["eval/loss"] == 1.2

    tp = Throughput(n_chips=2)
    tp.start()
    tp.add(60.0)
    _time.sleep(0.01)
    assert tp.rate() > 0
