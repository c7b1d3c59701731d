"""Measure XLA-level stream-compaction primitives on the real chip.

The wavefront render step needs: alive-flag cumsum -> full permutation ->
scatter of the ray planes -> (after pass B) gather-back of contributions.
Round-1 notes dismissed compaction as "ms-scale" based on argsort; this
measures the cumsum/scatter route at the real sizes (4.2M samples, 7 ray
planes) so the wavefront design decision is data, not folklore.

Inputs are re-perturbed every call (a cheap elementwise on-device op) so XLA
cannot fold anything; every timing includes that perturbation, whose cost is
reported separately as the baseline to subtract.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    n = 4 * 1024 * 1024
    planes = 7
    key = jax.random.PRNGKey(0)
    alive = (jax.random.uniform(key, (n,)) < 0.22)
    rays = jax.random.normal(jax.random.PRNGKey(1), (planes, n),
                             dtype=jnp.float32)
    salt = jnp.float32(1.0)

    def perm_of(alive):
        c = jnp.cumsum(alive.astype(jnp.int32))
        n_alive = c[-1]
        idx = jnp.arange(n, dtype=jnp.int32)
        rank_dead = idx + 1 - c
        return jnp.where(alive, c - 1, n_alive + rank_dead - 1)

    @jax.jit
    def base(salt, alive, rays):
        return (rays[0] * salt).sum()

    @jax.jit
    def perm_only(salt, alive, rays):
        a = alive ^ (salt > 2.0)
        return perm_of(a).sum() + (rays[0] * salt).sum()

    @jax.jit
    def compact(salt, alive, rays):
        a = alive ^ (salt > 2.0)
        perm = perm_of(a)
        r = rays * salt
        out = jnp.zeros_like(r).at[:, perm].set(
            r, unique_indices=True)
        return out[:, ::65536].sum()

    @jax.jit
    def gather_back(salt, alive, rays):
        a = alive ^ (salt > 2.0)
        perm = perm_of(a)
        return (rays[:3] * salt)[:, perm][:, ::65536].sum()

    @jax.jit
    def sort_compact(salt, alive, rays):
        a = alive ^ (salt > 2.0)
        order = jnp.argsort(~a, stable=True)
        return (rays * salt)[:, order][:, ::65536].sum()

    print("device:", jax.devices()[0])
    t_base = timeit(base, salt, alive, rays)
    print(f"baseline (perturb+reduce) {t_base:8.3f} ms")
    print(f"perm_only                 {timeit(perm_only, salt, alive, rays):8.3f} ms")
    print(f"compact scatter x{planes}      {timeit(compact, salt, alive, rays):8.3f} ms")
    print(f"gather_back x3            {timeit(gather_back, salt, alive, rays):8.3f} ms")
    print(f"argsort route x{planes}        {timeit(sort_compact, salt, alive, rays, n=5):8.3f} ms")

    @jax.jit
    def copy(salt, rays):
        return rays * salt
    print(f"7-plane scale (r+w floor) {timeit(copy, salt, rays):8.3f} ms")


if __name__ == "__main__":
    main()
