"""Stage-5 driver (v3): bilingual / multi-task distillation.

Counterpart of run_distillation_v3.py: N datasets zipped per step, each at
its own sub-batch, per-(task,lang) CE, selective KL, one student encoder
pass per dataset's audio (train/distill_multitask.py owns the loss).

Dataset spec syntax (repeatable):
  --dataset name:dir:key1+key2:kl     e.g. ja:/work/ja:transcribe.ja+translate.en:kl
  --dataset name:dir:key1:nokl        e.g. en:/work/en:transcribe.en:nokl
where `dir` holds features.npz + filtered.jsonl with labels/<key> columns
(cli/data_filter.py --label_column with a comma list). `dir` may be a
comma-joined GROUP of such dirs (the recipe's per-step randomized subset
group — script/distil_whisper_bilingual_v1.0.distillation.sh passes 5 ja
+ 3 en subsets per `distillation` call); rows/features are concatenated.
"""
from __future__ import annotations

import argparse
import time


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", action="append", required=True,
                    help="name:dir:key1+key2:kl|nokl (repeatable)")
    ap.add_argument("--student", required=True)
    ap.add_argument("--teacher", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--tokenizer", default="byte")
    ap.add_argument("--per_dataset_batch_size", type=int, default=4)
    ap.add_argument("--learning_rate", type=float, default=1e-4)
    ap.add_argument("--warmup_steps", type=int, default=500)
    ap.add_argument("--num_train_epochs", type=int, default=1)
    ap.add_argument("--max_steps", type=int, default=-1)
    ap.add_argument("--max_label_length", type=int, default=128)
    ap.add_argument("--temperature", type=float, default=2.0)
    ap.add_argument("--kl_weight", type=float, default=1.0)
    ap.add_argument("--logging_steps", type=int, default=25)
    ap.add_argument("--save_total_limit", type=int, default=1)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--dtype", default="bfloat16")
    arg = ap.parse_args(argv)

    from kotoba_whisper_tpu.utils.backend import ensure_backend

    ensure_backend()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kotoba_whisper_tpu.cli import common
    from kotoba_whisper_tpu.data.collator import CollatorConfig, collate_labels
    from kotoba_whisper_tpu.train import checkpoint, distill, optim
    from kotoba_whisper_tpu.train.distill_multitask import (
        DatasetSpec,
        make_multitask_train_step,
    )
    from kotoba_whisper_tpu.train.logging import MetricLogger

    specs = []
    data = []
    for spec_str in arg.dataset:
        name, d, keys, kl = spec_str.split(":")
        keys = tuple(keys.split("+"))
        rows = []
        feat_parts = []
        for part in d.split(","):
            part_rows = common.read_jsonl(f"{part}/filtered.jsonl")
            rows.extend(part_rows)
            feat_parts.append(np.load(f"{part}/features.npz")["input_features"])
        feats = (
            feat_parts[0] if len(feat_parts) == 1
            else np.concatenate(feat_parts, axis=0)
        )
        assert len(rows) == feats.shape[0], f"{name}: labels/features misaligned"
        specs.append(DatasetSpec(name, keys, use_kl=(kl == "kl")))
        data.append((rows, feats))
    specs = tuple(specs)

    student, s_cfg = common.load_model(arg.student)
    teacher, t_cfg = common.load_model(arg.teacher)
    compute_dtype = jnp.bfloat16 if arg.dtype == "bfloat16" else jnp.float32
    teacher = jax.tree.map(lambda x: x.astype(compute_dtype), teacher)

    dc = distill.DistillConfig(
        kl_weight=arg.kl_weight,
        temperature=arg.temperature,
        freeze_encoder=True,
        share_hidden_states=s_cfg.d_model == t_cfg.d_model,
        compute_dtype=compute_dtype,
    )
    tx, sched = optim.make_optimizer(
        student, lr=arg.learning_rate, warmup_steps=arg.warmup_steps
    )
    state = distill.init_train_state(student, tx)
    step_fn = jax.jit(
        make_multitask_train_step(s_cfg, t_cfg, dc, specs, tx, sched),
        donate_argnums=(0,),
    )

    ccfg = CollatorConfig(
        max_target_length=arg.max_label_length,
        decoder_start_token_id=s_cfg.decoder_start_token_id,
        pad_token_id=s_cfg.pad_token_id,
    )
    b = arg.per_dataset_batch_size
    steps_per_epoch = min(len(rows) // b for rows, _ in data)
    if steps_per_epoch == 0:
        raise SystemExit("a dataset is smaller than the per-dataset batch")

    logger = MetricLogger(arg.output_dir, run_name="bilingual")
    rng = np.random.default_rng(arg.seed)
    step = 0
    t_last = time.time()
    for epoch in range(arg.num_train_epochs):
        orders = [rng.permutation(len(rows)) for rows, _ in data]
        for k in range(steps_per_epoch):
            batches = []
            for (rows, feats), order, spec in zip(data, orders, specs):
                idx = order[k * b : (k + 1) * b]
                tasks = {}
                for key in spec.task_keys:
                    lab = collate_labels(
                        [rows[i][f"labels/{key}"] for i in idx], ccfg
                    )
                    tasks[key] = {
                        "labels": jnp.asarray(lab["labels"]),
                        "decoder_input_ids": jnp.asarray(lab["decoder_input_ids"]),
                    }
                batches.append(
                    {
                        "input_features": jnp.asarray(feats[idx], compute_dtype),
                        "tasks": tasks,
                    }
                )
            state, metrics = step_fn(state, teacher, tuple(batches))
            step += 1
            if step % arg.logging_steps == 0:
                m = {k2: float(v) for k2, v in metrics.items()}
                m["epoch"] = epoch
                m["time"] = time.time() - t_last
                t_last = time.time()
                logger.log(m, step)
                print(f"step {step}: loss={m['loss']:.4g} " + " ".join(
                    f"{k2}={v:.3g}" for k2, v in m.items() if k2.startswith("ce_loss.")
                ))
            if arg.max_steps > 0 and step >= arg.max_steps:
                break
        else:
            continue
        break

    checkpoint.save_train_state(arg.output_dir, state, epoch, arg.save_total_limit)
    checkpoint.export_hf_model(
        f"{arg.output_dir}/final", jax.device_get(state.params), s_cfg
    )
    logger.close()
    print(f"bilingual training done at step {step} -> {arg.output_dir}/final")


if __name__ == "__main__":
    main()
