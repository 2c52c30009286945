"""Stage-6 driver: latency benchmark on deterministic dummy audio.

Counterpart of run_speed_eval.py: durations x attention implementations,
mean/std over trials with warmup discard, appended to
eval_pipeline/runtime_pipeline.jsonl.
"""
from __future__ import annotations

import argparse


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True)
    ap.add_argument("--tokenizer", default="byte")
    ap.add_argument("--durations", default="10,30,60,300")
    ap.add_argument("--n_trials", type=int, default=5)
    ap.add_argument("--chunk_length_s", type=float, default=15.0)
    ap.add_argument("--attn", default=None, choices=[None, "xla", "pallas"])
    ap.add_argument("--output", default="eval_pipeline/runtime_pipeline.jsonl")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--kv_dtype", default="compute",
                    choices=["compute", "int8", "int4"])
    ap.add_argument("--gemm_dtype", default="compute",
                    choices=["compute", "int8"],
                    help="int8: w8a8 dense projections (models/quantized.py)")
    ap.add_argument("--no_fuse", action="store_true",
                    help="skip the lossless inference projection fusion")
    ap.add_argument("--wire_dtype", default="float32",
                    choices=["float32", "int16"],
                    help="int16: ship PCM samples to the device and "
                    "normalize there — halves the audio upload (lossless "
                    "for PCM-sourced audio; see decode/pipeline.py)")
    ap.add_argument("--max_length", type=int, default=128,
                    help="decode token budget per 15 s chunk. With random "
                    "weights (preset: models) the decode runs to this "
                    "budget, so it sets the measured decode length; the "
                    "committed table states it per row")
    arg = ap.parse_args(argv)

    import jax

    from kotoba_whisper_tpu.utils.backend import ensure_backend

    ensure_backend()
    import jax.numpy as jnp

    from kotoba_whisper_tpu.cli import common
    from kotoba_whisper_tpu.decode.pipeline import AsrPipeline
    from kotoba_whisper_tpu.eval.speed import evaluate_speed

    tok = common.load_tokenizer(arg.tokenizer)
    params, cfg = common.load_model(arg.model)
    compute_dtype = jnp.bfloat16 if arg.dtype == "bfloat16" else jnp.float32
    params = jax.tree.map(lambda x: x.astype(compute_dtype), params)
    params = common.fuse_unless(params, arg.no_fuse)
    params = common.quantize_if(params, arg.gemm_dtype)
    attn = arg.attn or ("pallas" if jax.default_backend() == "tpu" else "xla")

    gen_defaults = common.load_generation_defaults(arg.model)
    pipe = AsrPipeline(
        params=params, cfg=cfg, tok=tok,
        **gen_defaults,
        chunk_length_s=arg.chunk_length_s, compute_dtype=compute_dtype,
        attn_impl=attn, kv_dtype=arg.kv_dtype, max_length=arg.max_length,
        wire_dtype=arg.wire_dtype,
    )
    records = evaluate_speed(
        pipe.transcribe,
        model_name=arg.model,
        durations=[float(d) for d in arg.durations.split(",")],
        n_trials=arg.n_trials,
        output_path=arg.output,
        attn_impl=attn,
        extra={
            "max_length": arg.max_length,
            "kv_dtype": arg.kv_dtype,
            "gemm_dtype": arg.gemm_dtype,
            "chunk_length_s": arg.chunk_length_s,
            **({"wire_dtype": "int16"} if arg.wire_dtype == "int16" else {}),
        },
    )
    for r in records:
        print(r)


if __name__ == "__main__":
    main()
