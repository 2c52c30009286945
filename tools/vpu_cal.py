"""VPU calibration: the softmax wall of the encoder attention core.

docs/DESIGN.md attributes the encoder's remaining gap to the attention
core (~410 ms @ B=32 after the single-step kernel), whose dots are only
~11.8 TFLOP (~70-140 ms at achievable MXU rates). The rest is VPU work on
the score matrix. This tool measures that wall directly: a Pallas kernel
that runs ONLY the single-step softmax body (bias add, row max, subtract,
exp, row sum, renormalized cast) over VMEM-resident blocks of the exact
encoder shape, with no HBM traffic in the loop — i.e. the physical
per-element cost of the softmax pipeline on this chip.

Encoder score volume at large-v3 B=32: 32 layers x (B*H=640) rows x
(1500x1500) scores = 46.1e9 elements; the projected wall is
volume * measured ns/elem.

Usage: python tools/vpu_cal.py [--rows 512] [--cols 1536] [--iters 64]
       [--op softmax|exp]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import time

import jax

if os.environ.get("KWT_PLATFORM") == "cpu":
    # the axon plugin overrides JAX_PLATFORMS; only the config API works
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, o_ref, *, iters: int, op: str):
    x = x_ref[:]

    def body(i, acc):
        s = x + acc * 1e-9  # serialize iterations (defeat CSE)
        if op == "softmax":
            # EXACTLY the single-step kernel's per-score pipeline
            # (ops/flash_attention._fwd_kernel_single): bias-add is the
            # serializing add above, then max, subtract, exp, sum; the
            # normalizing division happens on the (rows, 1) reduce only.
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            return acc + jnp.sum(p, axis=-1, keepdims=True) / l
        return acc + jnp.sum(jnp.exp(s), axis=-1, keepdims=True)

    acc = jax.lax.fori_loop(
        0, iters, body, jnp.zeros((x.shape[0], 1), jnp.float32)
    )
    o_ref[:] = acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=512)
    ap.add_argument("--cols", type=int, default=1536)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--op", default="softmax", choices=["softmax", "exp"])
    args = ap.parse_args()

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.rows, args.cols)
        ).astype(np.float32)
    )
    fn = jax.jit(
        functools.partial(
            pl.pallas_call,
            functools.partial(_kernel, iters=args.iters, op=args.op),
            out_shape=jax.ShapeDtypeStruct((args.rows, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )()
    )
    float(jnp.sum(fn(x)))  # compile + readback fence
    times = []
    for _ in range(args.trials):
        t0 = time.perf_counter()
        float(jnp.sum(fn(x)))
        times.append(time.perf_counter() - t0)
    dt = float(np.min(times))
    elems = args.rows * args.cols * args.iters
    ns_per_elem = dt / elems * 1e9
    enc_volume = 32 * 32 * 20 * 1500 * 1500  # large-v3 B=32 score elements
    print(json.dumps({
        "op": args.op,
        "block": f"{args.rows}x{args.cols}x{args.iters}",
        "ms": round(dt * 1e3, 2),
        "gelem_per_s": round(elems / dt / 1e9, 1),
        "ns_per_elem": round(ns_per_elem, 4),
        "projected_encoder_softmax_ms_b32": round(
            enc_volume * ns_per_elem / 1e6, 1
        ),
    }))


if __name__ == "__main__":
    main()
