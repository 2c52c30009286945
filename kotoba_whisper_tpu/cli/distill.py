"""Stage-5 driver: distillation training.

Counterpart of run_distillation.py (call stack SURVEY.md §3.2): streams the
vectorized dataset (sharded mmap layout, data/shards.py; legacy
features.npz dirs also load), builds the pjit-sharded CE+KL train step
(train/distill.py), and runs the production epochs x splits schedule
(train/loader.py — the script/distil_whisper_v2.0.sh:182-202 loop with
next-split prefetch) with gradient accumulation, checkpoint
save/rotate/resume carrying the exact data-order position, and metric
logging with the reference's metric names
(train/loss|ce_loss|kl_loss|learning_rate|time).
"""
from __future__ import annotations

import argparse
import time


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", default=None,
                    help="single vectorized dir (back-compat alias for "
                    "--train_splits with one split)")
    ap.add_argument("--train_splits", default=None,
                    help="training data: a dir containing split_N subdirs "
                    "(data/merge.py output), a comma list of dirs, or one "
                    "dir; each split is streamed via mmap shards")
    ap.add_argument("--student", required=True)
    ap.add_argument("--teacher", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--tokenizer", default="byte")
    ap.add_argument("--per_device_train_batch_size", type=int, default=8)
    ap.add_argument("--gradient_accumulation_steps", type=int, default=1)
    ap.add_argument("--learning_rate", type=float, default=1e-4)
    ap.add_argument("--warmup_steps", type=int, default=500)
    ap.add_argument("--lr_scheduler_type", default="constant_with_warmup")
    ap.add_argument("--num_train_epochs", type=int, default=1)
    ap.add_argument("--max_steps", type=int, default=-1)
    ap.add_argument("--max_label_length", type=int, default=128)
    ap.add_argument("--temperature", type=float, default=2.0)
    ap.add_argument("--kl_weight", type=float, default=1.0)
    ap.add_argument("--freeze_encoder", action="store_true", default=True)
    ap.add_argument("--no_freeze_encoder", dest="freeze_encoder",
                    action="store_false")
    ap.add_argument("--save_steps", type=int, default=500)
    ap.add_argument("--save_total_limit", type=int, default=1)
    ap.add_argument("--logging_steps", type=int, default=25)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--mesh_model_axis", type=int, default=1)
    ap.add_argument("--num_devices", type=int, default=None,
                    help="restrict the mesh to the first N devices")
    ap.add_argument("--no_prefetch", action="store_true",
                    help="disable batch-assembly/next-split prefetch threads")
    ap.add_argument("--resume_from_checkpoint", action="store_true", default=True)
    ap.add_argument("--no_resume", dest="resume_from_checkpoint",
                    action="store_false")
    ap.add_argument("--wandb_project", default=None)
    from kotoba_whisper_tpu.cli import common

    common.add_distributed_flags(ap)
    arg = ap.parse_args(argv)
    if not (arg.data_dir or arg.train_splits):
        ap.error("one of --data_dir / --train_splits is required")

    import jax

    # multi-host training: join the process group before any device use.
    # The mesh below then spans all processes (DP across hosts by
    # default; --mesh_model_axis with a global mesh shards the teacher
    # over it), the loader feeds each host its order[process::count]
    # slice, and Orbax checkpointing coordinates the sharded save.
    multiproc = common.init_distributed(arg)

    from kotoba_whisper_tpu.utils.backend import ensure_backend

    ensure_backend()
    import jax.numpy as jnp
    import numpy as np
    from kotoba_whisper_tpu.core.mesh import MeshConfig, build_mesh
    from kotoba_whisper_tpu.data.collator import CollatorConfig, collate_labels
    from kotoba_whisper_tpu.data.shards import resolve_split_dirs
    from kotoba_whisper_tpu.parallel import sharded
    from kotoba_whisper_tpu.train import checkpoint, distill, optim
    from kotoba_whisper_tpu.train.loader import DataPosition, ScheduleLoader
    from kotoba_whisper_tpu.train.logging import MetricLogger

    split_dirs = resolve_split_dirs(arg.train_splits or arg.data_dir)
    tok = common.load_tokenizer(arg.tokenizer)

    student, s_cfg = common.load_model(arg.student)
    teacher, t_cfg = common.load_model(arg.teacher)
    compute_dtype = jnp.bfloat16 if arg.dtype == "bfloat16" else jnp.float32
    teacher = jax.tree.map(lambda x: x.astype(compute_dtype), teacher)

    devices = jax.devices()
    if arg.num_devices is not None:
        devices = devices[: arg.num_devices]
    mesh = build_mesh(MeshConfig(data=-1, model=arg.mesh_model_axis), devices)
    n_data = mesh.shape["data"]
    global_batch = arg.per_device_train_batch_size * n_data

    # multi-host: each process loads only its order[process::count] slice
    # of every shuffled split (the accelerate dataloader-sharding
    # equivalent); place_batch assembles the global array from the local
    # shards without cross-host data movement
    loader = ScheduleLoader(
        split_dirs,
        seed=arg.seed,
        global_batch=global_batch,
        num_epochs=arg.num_train_epochs,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        prefetch=not arg.no_prefetch,
    )
    for s in range(len(split_dirs)):
        if loader.batches_in_split(s) == 0:
            raise SystemExit(
                f"split {split_dirs[s]} has {loader.split_size(s)} rows < "
                f"global batch {global_batch} ({arg.per_device_train_batch_size}"
                f"/device x {n_data} data-parallel devices); shrink the batch "
                f"or --num_devices"
            )
    steps_per_epoch = loader.steps_per_epoch()

    dc = distill.DistillConfig(
        kl_weight=arg.kl_weight,
        temperature=arg.temperature,
        freeze_encoder=arg.freeze_encoder,
        share_hidden_states=arg.freeze_encoder
        and s_cfg.d_model == t_cfg.d_model,
        num_microbatches=arg.gradient_accumulation_steps,
        compute_dtype=compute_dtype,
    )
    tx, sched = optim.make_optimizer(
        student,
        lr=arg.learning_rate,
        warmup_steps=arg.warmup_steps,
        schedule=arg.lr_scheduler_type,
        total_steps=arg.max_steps if arg.max_steps > 0 else None,
    )
    state = distill.init_train_state(student, tx)
    step_fn = distill.jit_train_step(
        distill.make_train_step(s_cfg, t_cfg, dc, tx, sched)
    )

    # resume: restore params/opt state AND the exact data-order position
    # (reference semantics run_distillation.py:697-727; our position is a
    # pure (epoch, split, batch) key — see train/loader.py docstring)
    pos = DataPosition()
    last = checkpoint.get_last_checkpoint(arg.output_dir)
    if arg.resume_from_checkpoint and last is not None:
        path, resumed_step, start_epoch = last
        state = checkpoint.load_train_state(path, state)
        saved = DataPosition.load(path)
        if saved is not None:
            pos = saved
        elif steps_per_epoch > 0:
            # legacy checkpoint without data_state.json: derive from step
            pos = DataPosition(
                start_epoch, 0, resumed_step - start_epoch * steps_per_epoch
            )
        print(f"resumed from {path} (step {resumed_step}, {pos})")

    with mesh:
        teacher = sharded.place_params(
            mesh, teacher, model_sharded=arg.mesh_model_axis > 1
        )
        state = distill.TrainState(
            sharded.place_params(mesh, state.params),
            sharded.replicate(mesh, state.opt_state),
            sharded.replicate(mesh, state.step),
        )

        from kotoba_whisper_tpu.parallel import multihost

        # rank-aware logging (the reference gates trackers to the main
        # process, run_distillation.py:404-407); a shared output_dir must
        # not be written by every rank
        logger = MetricLogger(
            arg.output_dir if multihost.is_main_process() else None,
            wandb_project=(
                arg.wandb_project if multihost.is_main_process() else None
            ),
        )
        ccfg = CollatorConfig(
            max_target_length=arg.max_label_length,
            decoder_start_token_id=s_cfg.decoder_start_token_id,
            pad_token_id=s_cfg.pad_token_id,
        )
        step = int(state.step)
        t_last = time.time()
        last_pos = pos

        def save(state, pos_next: DataPosition) -> None:
            # collective: every rank participates in the Orbax sharded
            # save; only rank 0 writes the (tiny) data-position sidecar
            ck = checkpoint.save_train_state(
                arg.output_dir, state, pos_next.epoch, arg.save_total_limit
            )
            if multihost.is_main_process():
                pos_next.save(ck)
            multihost.barrier("ckpt_saved")

        for bpos, rows_b, feats_b in loader.batches(pos):
            lab = collate_labels([r["labels"] for r in rows_b], ccfg)
            batch = sharded.place_batch(
                mesh,
                {
                    "input_features": jnp.asarray(feats_b, compute_dtype),
                    "labels": jnp.asarray(lab["labels"]),
                    "decoder_input_ids": jnp.asarray(lab["decoder_input_ids"]),
                },
            )
            state, metrics = step_fn(state, teacher, batch)
            step += 1
            last_pos = bpos
            if step % arg.logging_steps == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics["epoch"] = bpos.epoch
                metrics["split"] = bpos.split
                metrics["time"] = time.time() - t_last
                t_last = time.time()
                logger.log(metrics, step)
                print(f"step {step}: " + ", ".join(
                    f"{k}={v:.4g}" for k, v in metrics.items()))
            if step % arg.save_steps == 0:
                save(state, loader.next_position(bpos))
            if arg.max_steps > 0 and step >= arg.max_steps:
                break

        save(state, loader.next_position(last_pos))
        # reassemble sharded params on host (collective when sharded
        # across processes), export on rank 0 only
        host_params = multihost.host_copy(state.params)
        if multihost.is_main_process():
            checkpoint.export_hf_model(
                f"{arg.output_dir}/final", host_params, s_cfg
            )
        multihost.barrier("export_done")
        logger.close()
        print(f"training done at step {step}; model exported to {arg.output_dir}/final")


if __name__ == "__main__":
    main()
