#!/usr/bin/env python
"""Microbenchmark: bounce-ray nearest-hit sweep formulations on real TPU.

CAVEAT (see PROFILE.md "methodology"): this harness's absolute numbers do
NOT transfer to the real kernel — its `vpu` baseline measured ~3x slower
per candidate than the identical sweep inside the fused kernel (the
chained-accumulator REPEATS serialize what the kernel pipelines). The
relative `mxu` comparison led to a no-go either way; kept as the record
of the experiment and as a harness template with honest chained-fetch
timing.

The 128-candidate sphere sweep is ~40% of the fused kernel's device time
(benchmarks/PROFILE.md). This harness times isolated Pallas kernels that run
REPEATS sweeps over one (32,128) lane block each, comparing:

  vpu        — the production sweep (intersect_sphere_scene, fully unrolled,
               scalar constants from SMEM; 6 where-merges per candidate)
  vpu2carry  — same t/candidate math but carrying only (t, index); winner
               constants recovered after the sweep by a one-hot second pass
               (128 compares + 4 fused selects vs 4*128 merge selects)
  mxu        — the direction/origin dot products lifted to jnp.dot on
               sphere-constant matrices: X (lanes,3) @ C^T (3,n) for both
               d.c and o.c, epilogue on (lanes, n) planes, sublane-axis min
               reduction + one-hot constant recovery

Prints ns per (lane x candidate) and the projected ms for the reference
workload's bounce sweeps. Exactness is asserted against the vpu variant
(all three compute the same roots in f32).
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from l2n_tpu.config import RenderConfig
from l2n_tpu.scene import compute_spheres

REPEATS = 16
TH, TW = 32, 128
BIG = 3.0e38


def _perturb(dx, dy, dz, r):
    # Cheap per-repeat direction change so repeats don't CSE away; keeps
    # unit-ish length (exactness is checked per repeat against the oracle).
    f32 = jnp.float32
    s = f32(1.0) + f32(1e-4) * r
    return dx * s, dy, dz


def _vpu_candidate(carry6, ox, oy, oz, dx, dy, dz, cx, cy, cz, r2):
    f32 = jnp.float32
    best_t, best_i, bcx, bcy, bcz, br2, j = carry6
    rox, roy, roz = ox - cx, oy - cy, oz - cz
    hb = rox * dx + roy * dy + roz * dz
    c = rox * rox + roy * roy + roz * roz - r2
    sq = jnp.sqrt(hb * hb - c)
    t1 = -hb - sq
    t2 = -hb + sq
    t = jnp.where(t1 >= 0.0, t1, t2)
    t = jnp.where(t >= 0.0, t, f32(BIG))
    better = t < best_t
    shape = jnp.shape(best_t)
    return (jnp.where(better, t, best_t),
            jnp.where(better, j, best_i),
            jnp.where(better, jnp.broadcast_to(cx, shape), bcx),
            jnp.where(better, jnp.broadcast_to(cy, shape), bcy),
            jnp.where(better, jnp.broadcast_to(cz, shape), bcz),
            jnp.where(better, jnp.broadcast_to(r2, shape), br2), j + 1)


def _kernel_vpu(n, o_ref, d_ref, cx_ref, cy_ref, cz_ref, r2_ref, bias_ref, out_ref):
    f32 = jnp.float32
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    acc = bias_ref[0]
    for r in range(REPEATS):
        dx, dy, dz = _perturb(d_ref[0], d_ref[1], d_ref[2], r)
        carry = (jnp.full((TH, TW), f32(BIG)), jnp.full((TH, TW), -1,
                                                        jnp.int32),
                 acc * 0, acc * 0, acc * 0, acc * 0, jnp.int32(0))
        for j in range(n):
            carry = _vpu_candidate(carry, ox, oy, oz, dx, dy, dz,
                                   cx_ref[j], cy_ref[j], cz_ref[j], r2_ref[j])
        best_t, best_i, bcx, bcy, bcz, br2, _ = carry
        acc = acc + jnp.where(best_t < BIG, best_t, 0.0) + bcx * 1e-6 \
            + br2 * 1e-9 + best_i.astype(f32) * 1e-3
    out_ref[...] = acc


def _kernel_vpu2(n, o_ref, d_ref, cx_ref, cy_ref, cz_ref, r2_ref, bias_ref, out_ref):
    f32 = jnp.float32
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    acc = bias_ref[0]
    for r in range(REPEATS):
        dx, dy, dz = _perturb(d_ref[0], d_ref[1], d_ref[2], r)
        best_t = jnp.full((TH, TW), f32(BIG))
        best_i = jnp.full((TH, TW), -1, jnp.int32)
        for j in range(n):
            cx, cy, cz, r2 = cx_ref[j], cy_ref[j], cz_ref[j], r2_ref[j]
            rox, roy, roz = ox - cx, oy - cy, oz - cz
            hb = rox * dx + roy * dy + roz * dz
            c = rox * rox + roy * roy + roz * roz - r2
            sq = jnp.sqrt(hb * hb - c)
            t1 = -hb - sq
            t2 = -hb + sq
            t = jnp.where(t1 >= 0.0, t1, t2)
            t = jnp.where(t >= 0.0, t, f32(BIG))
            better = t < best_t
            best_t = jnp.where(better, t, best_t)
            best_i = jnp.where(better, jnp.int32(j), best_i)
        # One-hot recovery of the winner's constants.
        bcx = jnp.zeros((TH, TW), f32)
        bcy = jnp.zeros((TH, TW), f32)
        bcz = jnp.zeros((TH, TW), f32)
        br2 = jnp.zeros((TH, TW), f32)
        for j in range(n):
            m = (best_i == j).astype(f32)
            bcx = bcx + m * cx_ref[j]
            bcy = bcy + m * cy_ref[j]
            bcz = bcz + m * cz_ref[j]
            br2 = br2 + m * r2_ref[j]
        acc = acc + jnp.where(best_t < BIG, best_t, 0.0) + bcx * 1e-6 \
            + br2 * 1e-9 + best_i.astype(f32) * 1e-3
    out_ref[...] = acc


def _kernel_mxu(n, rows_per_chunk, o_ref, d_ref, cmat_ref, bias_ref, out_ref):
    """cmat: (8, n) f32 VMEM — rows cx, cy, cz, r2, |c|^2 - r^2.

    Transpose-free MXU formulation: process the tile `rows_per_chunk`
    sublane-rows at a time. A chunk's pixels live on the LANE axis (W =
    rows_per_chunk * TW lanes after a lane-axis concat of rows); spheres
    live on SUBLANES. The 3-component dot products become
    dot_general((3, n), (3, W)) -> (n, W) on the MXU; the epilogue runs on
    (n, W) planes; the min over spheres is a SUBLANE reduction landing
    naturally back in (1, W) row layout; winner constants come from a
    one-hot (n, W) matmul against cmat (4, n) -> (4, W). No relayouts
    anywhere."""
    f32 = jnp.float32
    ct = cmat_ref[0:3, :]                       # (3, n) on sublanes
    ccr = cmat_ref[4:5, :].reshape(n, 1)        # (n, 1) |c|^2 - r^2
    c4 = cmat_ref[0:4, :]                       # (4, n)
    dn = (((0,), (0,)), ((), ()))               # contract axis 0 with axis 0
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, rows_per_chunk * TW), 0)
    acc = bias_ref[0]

    def row3(ref, r, k):
        rows = [ref[k, r + j:r + j + 1, :] for j in range(rows_per_chunk)]
        return jnp.concatenate(rows, axis=1)    # (1, chunk*TW)

    for rep in range(REPEATS):
        outs = []
        for r in range(0, TH, rows_per_chunk):
            ox, oy, oz = (row3(o_ref, r, k) for k in range(3))
            dx, dy, dz = (row3(d_ref, r, k) for k in range(3))
            dx, dy, dz = _perturb(dx, dy, dz, rep)
            d3 = jnp.concatenate([dx, dy, dz], axis=0)   # (3, W)
            o3 = jnp.concatenate([ox, oy, oz], axis=0)   # (3, W)
            cd = jax.lax.dot_general(ct, d3, dn,
                                     preferred_element_type=f32)  # (n, W)
            oc = jax.lax.dot_general(ct, o3, dn,
                                     preferred_element_type=f32)  # (n, W)
            oo = ox * ox + oy * oy + oz * oz             # (1, W)
            od = ox * dx + oy * dy + oz * dz             # (1, W)
            c = oo - (oc + oc) + ccr                     # (n, W)
            hb = od - cd                                 # (n, W)
            sq = jnp.sqrt(hb * hb - c)
            t1 = -hb - sq
            t2 = -hb + sq
            t = jnp.where(t1 >= 0.0, t1, t2)
            t = jnp.where(t >= 0.0, t, f32(BIG))
            best_t = jnp.min(t, axis=0, keepdims=True)   # (1, W)
            is_best = (t == best_t) & (best_t < f32(BIG))
            best_i = jnp.min(jnp.where(is_best, iota, jnp.int32(n)),
                             axis=0, keepdims=True)      # (1, W)
            onehot = (iota == best_i).astype(f32)        # (n, W)
            win = jax.lax.dot_general(c4, onehot,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=f32)  # (4, W)
            best_if = jnp.where(best_i < n, best_i, -1).astype(f32)
            row_acc = (jnp.where(best_t < f32(BIG), best_t, 0.0)
                       + win[0:1] * 1e-6 + win[3:4] * 1e-9 + best_if * 1e-3)
            # Un-chunk: lane-slice each original row back out (128-aligned
            # lane slices are native; no sublane/lane relayout involved).
            for j in range(rows_per_chunk):
                outs.append(row_acc[:, j * TW:(j + 1) * TW])  # (1, TW)
        acc = acc + jnp.concatenate(outs, axis=0)             # (TH, TW)
    out_ref[...] = acc


def run(name, kern, inputs, in_specs, blocks=64):
    """Times CALLS chained executions (each call's output is the next
    call's bias input, defeating reordering) and ends with a real host
    fetch — plain block_until_ready through the axon tunnel was observed
    to return before the kernel finishes."""
    call = pl.pallas_call(
        kern,
        grid=(blocks,),
        in_specs=list(in_specs) + [pl.BlockSpec((None, TH, TW),
                                                lambda i: (i, 0, 0),
                                                memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, TH, TW), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((blocks, TH, TW), jnp.float32),
    )
    f = jax.jit(lambda *a: call(*a))
    bias = jnp.zeros((blocks, TH, TW), jnp.float32)
    first = np.asarray(f(*inputs, bias))  # compile + reference value
    calls = 8
    best = float("inf")
    for _ in range(3):
        out = bias
        t0 = time.perf_counter()
        for _ in range(calls):
            out = f(*inputs, out)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / calls)
    lanes = blocks * TH * TW * REPEATS
    n = 128
    print(f"{name:10s}: {best*1e3:7.3f} ms  "
          f"{best/ (lanes*n) * 1e12:6.2f} ps/(lane*cand)  "
          f"[{lanes*n/1e9:.2f} G cand/call]")
    return first


def main():
    cfg = RenderConfig().validate()
    scene = compute_spheres(128, 1024.0, cfg.scene_seed)
    n = 128
    rng = np.random.default_rng(0)
    blocks = 64
    o = jnp.asarray(rng.uniform(-400, 400, (3, blocks, TH, TW)), jnp.float32)
    d = rng.normal(size=(3, blocks, TH, TW))
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    cx = jnp.asarray(scene.center_x)
    cy = jnp.asarray(scene.center_y)
    cz = jnp.asarray(scene.center_z)
    r2 = jnp.asarray(scene.sqr_radius)
    cmat = jnp.stack([cx, cy, cz, r2,
                      cx * cx + cy * cy + cz * cz - r2,
                      r2 * 0, r2 * 0, r2 * 0], axis=0)  # (8, n)

    vec = lambda planes: pl.BlockSpec((planes, None, TH, TW),
                                      lambda i: (0, i, 0, 0),
                                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    a = run("vpu", partial(_kernel_vpu, n), (o, d, cx, cy, cz, r2),
            [vec(3), vec(3), smem, smem, smem, smem], blocks)
    b = run("vpu2carry", partial(_kernel_vpu2, n), (o, d, cx, cy, cz, r2),
            [vec(3), vec(3), smem, smem, smem, smem], blocks)
    print("max |vpu2 - vpu|:", np.abs(b - a).max())
    for rpc in (1, 4, 8):
        c = run(f"mxu rpc={rpc}", partial(_kernel_mxu, n, rpc),
                (o, d, cmat),
                [vec(3), vec(3), pl.BlockSpec(memory_space=pltpu.VMEM)],
                blocks)
        print(f"max |mxu rpc={rpc} - vpu|:", np.abs(c - a).max())


if __name__ == "__main__":
    main()
