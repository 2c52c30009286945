"""Streaming shard store + epochs x splits schedule + exact resume.

Covers the production-scale training orchestration (the reference's
merge -> split_N -> 8 epochs x 9 splits loop, script/distil_whisper_v2.0.sh
:120,182-202, and run_distillation.py:697-727 resume semantics): bounded-
memory mmap access, deterministic host-sharded shuffles, and a mid-split
kill/resume that reproduces the uninterrupted run bit-exactly.
"""
import json
import os

import numpy as np
import pytest

from kotoba_whisper_tpu.data.shards import (
    FeatureStore,
    ShardWriter,
    resolve_split_dirs,
)
from kotoba_whisper_tpu.train.loader import (
    DataPosition,
    ScheduleLoader,
    split_order,
)


def _make_split(dir_, n, n_mels=4, n_frames=8, shard_size=3, seed=0):
    rng = np.random.default_rng(seed)
    w = ShardWriter(str(dir_), shard_size=shard_size)
    for i in range(n):
        w.add(
            {"name": f"u{i}", "labels": [1, 2, 3 + i % 5]},
            rng.standard_normal((n_mels, n_frames)).astype(np.float16),
        )
    w.close()
    return str(dir_)


def test_shard_store_roundtrip_and_mmap(tmp_path):
    d = _make_split(tmp_path / "s", n=10, shard_size=3)
    store = FeatureStore(d)
    assert len(store) == 10
    assert store.index["shard_sizes"] == [3, 3, 3, 1]
    # random access pulls from mmapped shards, not RAM copies
    assert isinstance(store._shard(0), np.memmap)
    idx = np.array([9, 0, 5, 5, 2])
    got = store.gather(idx)
    ref = np.concatenate(
        [np.load(os.path.join(d, f"features_{k:05d}.npy")) for k in range(4)]
    )
    np.testing.assert_array_equal(got, ref[idx])
    store.warm()  # page-cache prefetch path runs


def test_resolve_split_dirs(tmp_path):
    for i in range(3):
        (tmp_path / f"split_{i}").mkdir()
    (tmp_path / "split_10").mkdir()
    dirs = resolve_split_dirs(str(tmp_path))
    assert [os.path.basename(d) for d in dirs] == [
        "split_0", "split_1", "split_2", "split_10",
    ]
    assert resolve_split_dirs("a,b") == ["a", "b"]
    assert resolve_split_dirs(str(tmp_path / "split_0")) == [
        str(tmp_path / "split_0")
    ]


def test_split_order_host_sharding():
    full = split_order(7, 2, 1, 20)
    parts = [split_order(7, 2, 1, 20, process_index=p, process_count=4)
             for p in range(4)]
    assert sorted(np.concatenate(parts).tolist()) == list(range(20))
    np.testing.assert_array_equal(np.concatenate(parts), full.reshape(5, 4).T.reshape(-1))
    # pure function of (seed, epoch, split): no RNG state to persist
    np.testing.assert_array_equal(full, split_order(7, 2, 1, 20))
    assert not np.array_equal(full, split_order(7, 3, 1, 20))


def test_schedule_loader_coverage_and_resume(tmp_path):
    dirs = [
        _make_split(tmp_path / f"split_{i}", n=10 + 3 * i, seed=i)
        for i in range(3)
    ]
    loader = ScheduleLoader(
        dirs, seed=1, global_batch=4, num_epochs=2, prefetch=False
    )
    assert loader.batches_in_split(0) == 2  # 10 // 4
    assert loader.steps_per_epoch() == 2 + 3 + 4

    stream = list(loader.batches())
    assert len(stream) == 2 * 9
    # each epoch visits every split; batches carry their own position
    seen = [(p.epoch, p.split, p.batch) for p, _, _ in stream]
    assert seen[0] == (0, 0, 0) and seen[-1] == (1, 2, 3)

    # resume from an arbitrary mid-split position reproduces the suffix
    k = 7
    resume_at = loader.next_position(stream[k - 1][0])
    tail = list(loader.batches(resume_at))
    assert len(tail) == len(stream) - k
    for (p1, r1, f1), (p2, r2, f2) in zip(stream[k:], tail):
        assert p1 == p2 and r1 == r2
        np.testing.assert_array_equal(f1, f2)

    # prefetch threads produce the identical stream
    loader_p = ScheduleLoader(
        dirs, seed=1, global_batch=4, num_epochs=2, prefetch=True
    )
    stream_p = list(loader_p.batches())
    assert [(p.epoch, p.split, p.batch) for p, _, _ in stream_p] == seen
    for (_, r1, f1), (_, r2, f2) in zip(stream, stream_p):
        assert r1 == r2
        np.testing.assert_array_equal(f1, f2)


def test_next_position_normalization(tmp_path):
    dirs = [_make_split(tmp_path / f"split_{i}", n=8, seed=i) for i in range(2)]
    loader = ScheduleLoader(
        dirs, seed=0, global_batch=4, num_epochs=3, prefetch=False
    )
    # 2 batches per split
    assert loader.next_position(DataPosition(0, 0, 0)) == DataPosition(0, 0, 1)
    assert loader.next_position(DataPosition(0, 0, 1)) == DataPosition(0, 1, 0)
    assert loader.next_position(DataPosition(0, 1, 1)) == DataPosition(1, 0, 0)


@pytest.mark.slow
def test_cli_distill_kill_resume_exact(tmp_path):
    """Mid-split kill/resume: interrupting training and re-running the same
    command yields the SAME final parameters as an uninterrupted run (the
    reference's save_state/skip_first_batches contract, run_distillation.py
    :697-727, made bit-exact by the (epoch, split, batch) position)."""
    from kotoba_whisper_tpu.cli import create_student, distill

    rng = np.random.default_rng(0)
    n_mels, n_frames = 80, 3000
    for s in range(2):
        w = ShardWriter(str(tmp_path / "merged" / f"split_{s}"), shard_size=4)
        for i in range(10):
            w.add(
                {"name": f"s{s}u{i}",
                 "labels": rng.integers(10, 200, size=6).tolist()},
                (rng.standard_normal((n_mels, n_frames)) * 0.3).astype(np.float16),
            )
        w.close()

    create_student.main([
        "--teacher", "preset:test-byte",
        "--save_dir", f"{tmp_path}/student",
        "--decoder_layers", "1",
    ])

    def run(out, max_steps):
        distill.main([
            "--train_splits", f"{tmp_path}/merged",
            "--student", f"{tmp_path}/student",
            "--teacher", "preset:test-byte",
            "--output_dir", out,
            "--tokenizer", "byte",
            "--per_device_train_batch_size", "2",
            "--num_devices", "2",
            "--max_label_length", "16",
            "--warmup_steps", "2",
            "--logging_steps", "1",
            "--save_steps", "100",
            "--dtype", "float32",
            "--num_train_epochs", "2",
        ] + (["--max_steps", str(max_steps)] if max_steps else []))

    def final_params(out):
        p = f"{out}/final/model.safetensors"
        if os.path.exists(p):
            from safetensors.numpy import load_file

            return load_file(p)
        return dict(np.load(f"{out}/final/model.npz"))

    # 2 splits x 2 batches x 2 epochs = 8 steps total
    run(f"{tmp_path}/uninterrupted", None)

    run(f"{tmp_path}/resumed", 3)  # killed mid split_1 of epoch 0
    ck = [d for d in os.listdir(f"{tmp_path}/resumed")
          if d.startswith("checkpoint-")]
    assert ck, "interrupted run saved a checkpoint"
    pos = json.load(open(f"{tmp_path}/resumed/{ck[0]}/data_state.json"))
    assert (pos["epoch"], pos["split"], pos["batch"]) == (0, 1, 1)
    run(f"{tmp_path}/resumed", None)  # same command again -> resumes

    a = final_params(f"{tmp_path}/uninterrupted")
    b = final_params(f"{tmp_path}/resumed")
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
