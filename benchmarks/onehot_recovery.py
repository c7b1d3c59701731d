"""Experiment: one-hot MXU winner-attribute recovery for the bounce sweep.

The 128-candidate nearest sweep (l2n_tpu/ops/intersect.py) carries the
winner's (cx, cy, cz, r2) through 4 selects per candidate — ~4 of its
~25 issue slots. This experiment drops those carries (keep best_t +
best_i only) and recovers the attributes AFTER the sweep:

    OH[p, s]  = (best_i[p] == s)                   # (32,128,S) masks
    attrs[p]  = OH[p, :] @ table[:, 0:4]           # one (…,S)x(S,4) matmul

Cost model: building OH is cmp+cvt = 2 vreg-ops/sphere vs the removed
4 selects/sphere; the matmul is ~4M MACs (noise on the MXU). Net ~-2
ops/candidate IF Mosaic schedules it cleanly.

Exactness: one-hot rows make the matmul a gather — each output is
1.0*attr + zeros. With precision=HIGHEST the f32 operand is split into
bf16 triples that re-sum exactly, so the gathered value is bit-equal to
the table entry (verified below against the select-carry sweep).

Usage:  python benchmarks/onehot_recovery.py [check|time]
  check — bit-equality of both recoveries on random rays (TPU or CPU
          interpret), plus a Mosaic compile smoke test.
  time  — marginal per-call time of sweep variants on the live chip.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 128          # spheres
TH, TW = 32, 128  # lane block
REPS = 400


def _scene(seed=7):
    r = np.random.RandomState(seed)
    c = r.uniform(-4, 4, size=(3, S)).astype(np.float32)
    rad = r.uniform(0.2, 0.9, size=(S,)).astype(np.float32)
    return c[0], c[1], c[2], (rad * rad).astype(np.float32)


def _rays(seed=3):
    r = np.random.RandomState(seed)
    o = r.uniform(-6, 6, size=(3, TH, TW)).astype(np.float32)
    d = r.normal(size=(3, TH, TW)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    return [o[i] for i in range(3)] + [d[i] for i in range(3)]


def _sweep(ox, oy, oz, dx, dy, dz, fetch, carry_attrs: bool):
    """The bounce nearest sweep (assume_outside form), fully unrolled."""
    f32 = jnp.float32
    big = f32(3.0e38)
    shape = jnp.shape(dx)
    best_t = jnp.full(shape, big, f32)
    best_i = jnp.full(shape, -1, jnp.int32)
    if carry_attrs:
        attrs = (jnp.zeros(shape, f32), jnp.zeros(shape, f32),
                 jnp.zeros(shape, f32), jnp.ones(shape, f32))
    for s in range(S):
        cx, cy, cz, r2 = fetch(s)
        cox, coy, coz = cx - ox, cy - oy, cz - oz
        nhb = cox * dx + coy * dy + coz * dz
        c = (cox * cox - r2) + coy * coy + coz * coz
        sq = jnp.sqrt(nhb * nhb - c)
        t1 = nhb - sq
        t = jnp.where(t1 >= 0.0, t1, big)
        better = t < best_t
        best_t = jnp.where(better, t, best_t)
        best_i = jnp.where(better, jnp.int32(s), best_i)
        if carry_attrs:
            attrs = tuple(
                jnp.where(better, jnp.broadcast_to(v, shape), a)
                for v, a in zip((cx, cy, cz, r2), attrs))
    if carry_attrs:
        return best_t, best_i, attrs
    return best_t, best_i


def _onehot_recover(best_i, table):
    """table: (S, 4) f32 in VMEM. Returns 4 (TH,TW) gathered planes."""
    oh = (best_i[:, :, None] ==
          jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2))
    oh = oh.astype(jnp.float32)          # (TH, TW, S)
    g = jax.lax.dot_general(
        oh, table, (((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)   # (TH, TW, 4)
    return g[:, :, 0], g[:, :, 1], g[:, :, 2], g[:, :, 3]


def _kernel_carry(ox, oy, oz, dx, dy, dz, cx, cy, cz, r2, out):
    fetch = lambda s: (cx[0, s], cy[0, s], cz[0, s], r2[0, s])
    t, i, (acx, acy, acz, ar2) = _sweep(
        ox[...], oy[...], oz[...], dx[...], dy[...], dz[...], fetch, True)
    out[0] = t
    out[1] = i.astype(jnp.float32)
    out[2] = acx
    out[3] = acy
    out[4] = acz
    out[5] = ar2


def _kernel_onehot(ox, oy, oz, dx, dy, dz, cx, cy, cz, r2, tbl, out):
    fetch = lambda s: (cx[0, s], cy[0, s], cz[0, s], r2[0, s])
    t, i = _sweep(ox[...], oy[...], oz[...], dx[...], dy[...], dz[...],
                  fetch, False)
    acx, acy, acz, ar2 = _onehot_recover(i, tbl[...])
    out[0] = t
    out[1] = i.astype(jnp.float32)
    out[2] = acx
    out[3] = acy
    out[4] = acz
    out[5] = ar2


def _build(kind: str, interpret: bool):
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vec = lambda: pl.BlockSpec(memory_space=pltpu.ANY)
    n_in = 10 + (1 if kind == "onehot" else 0)
    kern = _kernel_carry if kind == "carry" else _kernel_onehot
    in_specs = ([pl.BlockSpec((TH, TW), lambda: (0, 0))] * 6
                + [smem()] * 4
                + ([pl.BlockSpec((S, 8), lambda: (0, 0))]
                   if kind == "onehot" else []))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((6, TH, TW), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((6, TH, TW), lambda: (0, 0, 0)),
        interpret=interpret,
    )


def _args(kind):
    ox, oy, oz, dx, dy, dz = _rays()
    cx, cy, cz, r2 = _scene()
    base = [ox, oy, oz, dx, dy, dz,
            cx[None, :], cy[None, :], cz[None, :], r2[None, :]]
    if kind == "onehot":
        tbl = np.zeros((S, 8), np.float32)   # lane-pad 4 -> 8
        tbl[:, 0], tbl[:, 1], tbl[:, 2], tbl[:, 3] = cx, cy, cz, r2
        base.append(tbl)
    return [jnp.asarray(a) for a in base]


def check():
    interpret = jax.devices()[0].platform != "tpu"
    a = np.asarray(_build("carry", interpret)(*_args("carry")))
    b = np.asarray(_build("onehot", interpret)(*_args("onehot")))
    hit = a[1] >= 0
    print(f"hit fraction: {hit.mean():.3f}")
    for k, name in enumerate(["t", "i", "cx", "cy", "cz", "r2"]):
        eq = np.array_equal(a[k][hit], b[k][hit])
        print(f"  {name}: bit-equal on hits = {eq}")
        if not eq:
            d = np.abs(a[k] - b[k])[hit]
            print(f"    max |diff| = {d.max():.3e}")
    ok = all(np.array_equal(a[k][hit], b[k][hit]) for k in range(6))
    print("CHECK", "PASS" if ok else "FAIL")
    return ok


def timeit():
    assert jax.devices()[0].platform == "tpu", "time mode needs the chip"
    for kind in ("carry", "onehot"):
        f = jax.jit(lambda args, f=_build(kind, False): f(*args))
        args = _args(kind)
        out = f(args)
        out.block_until_ready()
        # Marginal timing: (t(2N) - t(N)) / N with a dependent chain to
        # defeat dispatch pipelining illusions; end with a real fetch.
        def run(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = f(args)
            np.asarray(o)
            return time.perf_counter() - t0
        run(20)
        t1, t2 = run(REPS), run(2 * REPS)
        ms = (t2 - t1) / REPS * 1e3
        print(f"{kind:7s}: {ms:.4f} ms/call marginal")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    {"check": check, "time": timeit}[mode]()
