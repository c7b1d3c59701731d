#!/usr/bin/env python
"""Microbenchmark: cost of lax.cond / jnp.any inside a Mosaic kernel.

Times a grid of programs each running REPS copies of a structure over
(32, 128) f32 blocks, isolating:
  * `work`: W chained vector FMAs (baseline slope: ns per vector op)
  * `any`: a jnp.any cross-lane reduction feeding nothing conditional
  * `cond_taken` / `cond_skipped`: lax.cond with M carried vectors whose
    predicate is always true / false, branch body = W FMAs on carry[0]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRID = 256
REPS = 16
SHAPE = (32, 128)


def _kernel(mode, m_carry, w_work, x_ref, o_ref):
    x = x_ref[0]
    acc = x
    for r in range(REPS):
        if mode == "work":
            for _ in range(w_work):
                acc = acc * jnp.float32(1.0000001) + jnp.float32(1e-9)
        elif mode == "any":
            flag = jnp.any(acc > jnp.float32(-1e30))
            acc = acc + jnp.where(flag, jnp.float32(1e-9), jnp.float32(0.0))
        else:
            pred = (jnp.any(acc > jnp.float32(-1e30)) if mode == "cond_taken"
                    else jnp.any(acc > jnp.float32(1e30)))
            carry = tuple(acc + jnp.float32(i) for i in range(m_carry))

            def body(c):
                h = c[0]
                for _ in range(w_work):
                    h = h * jnp.float32(1.0000001) + jnp.float32(1e-9)
                return (h,) + c[1:]

            carry = jax.lax.cond(pred, body, lambda c: c, carry)
            acc = carry[0]
    o_ref[0] = acc


def run(mode, m_carry=0, w_work=0):
    x = jnp.ones((1, *SHAPE), jnp.float32)
    call = pl.pallas_call(
        partial(_kernel, mode, m_carry, w_work),
        grid=(GRID,),
        in_specs=[pl.BlockSpec((1, *SHAPE), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, *SHAPE), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, *SHAPE), jnp.float32),
    )
    f = jax.jit(call)
    f(x).block_until_ready()
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(10):
            f(x).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / 10)
    per = best / (GRID * REPS) * 1e9
    print(f"{mode:13s} m={m_carry:2d} w={w_work:3d}  {per:9.1f} ns/unit",
          flush=True)
    return per


def main():
    base = run("work", w_work=0)
    for w in (16, 64, 256):
        run("work", w_work=w)
    run("any")
    for m in (1, 3, 6, 12, 20):
        run("cond_taken", m_carry=m, w_work=16)
        run("cond_skipped", m_carry=m, w_work=16)


if __name__ == "__main__":
    main()
