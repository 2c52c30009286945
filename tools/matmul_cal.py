"""MXU calibration: achievable bf16 matmul rate at encoder shapes.

Gives the realistic roofline denominator for docs/DESIGN.md's encoder
efficiency numbers: a chain of (N,1280)x(1280,1280) and (N,1280)x(1280,5120)
matmuls with fp32 accumulation, N = B*1500 tokens, matching the encoder's
dominant GEMMs.
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--d_model", type=int, default=1280)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "int8"],
                    help="int8: s8xs8->s32 MXU rate (2x bf16 peak on v5e)")
    args = ap.parse_args()

    n = args.batch * 1500
    d = args.d_model
    f = 4 * d
    key = jax.random.key(0)
    if args.dtype == "int8":
        ints = jax.random.randint(key, (n, d), -127, 127, jnp.int8)
        x = ints
        w1 = jax.random.randint(key, (d, f), -127, 127, jnp.int8)
        w2 = jax.random.randint(key, (f, d), -127, 127, jnp.int8)

        @jax.jit
        def chain(x, w1, w2):
            def body(x, _):
                h = jnp.dot(
                    x, w1, preferred_element_type=jnp.int32
                ).astype(jnp.int8)  # wrap-around requant: timing only
                x = jnp.dot(h, w2, preferred_element_type=jnp.int32).astype(
                    jnp.int8
                )
                return x, None
            x, _ = jax.lax.scan(body, x, None, length=args.steps)
            return x
    else:
        x = jax.random.normal(key, (n, d), jnp.bfloat16)
        w1 = jax.random.normal(key, (d, f), jnp.bfloat16) * 0.02
        w2 = jax.random.normal(key, (f, d), jnp.bfloat16) * 0.02

        @jax.jit
        def chain(x, w1, w2):
            def body(x, _):
                h = jnp.dot(x, w1, preferred_element_type=jnp.float32).astype(
                    jnp.bfloat16
                )
                x = jnp.dot(h, w2, preferred_element_type=jnp.float32).astype(
                    jnp.bfloat16
                )
                return x, None
            x, _ = jax.lax.scan(body, x, None, length=args.steps)
            return x

    # force a host readback: on this environment's remote plugin,
    # block_until_ready alone has been observed not to fence execution
    # for programs whose inputs already live on device
    float(jnp.sum(chain(x, w1, w2)))
    times = []
    for _ in range(args.trials):
        t0 = time.perf_counter()
        float(jnp.sum(chain(x, w1, w2)))
        times.append(time.perf_counter() - t0)
    dt = float(np.min(times))
    flops = 2 * 2 * n * d * f * args.steps
    print(
        json.dumps(
            {
                "shape": f"({n},{d})x({d},{f}) chain x{args.steps}",
                "dtype": args.dtype,
                "ms": round(dt * 1e3, 2),
                "tflops": round(flops / dt / 1e12, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
