"""Procedural shell-walk intersector vs brute-force Möller-Trumbore.

The shellwalk recomputes candidate geometry per lane (no lockstep union);
on non-pending lanes its nearest hit must agree with a brute-force sweep
over the stored triangle soup up to the procedural-trig tolerance
(in-kernel sin/cos vs numpy sin/cos, ~1 ulp of vertex position).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from l2n_tpu.ops.kernels import shellwalk as sw
from l2n_tpu.scene import build_triangle_scene, compute_spheres

DL, DJ = 16, 8


@pytest.fixture(scope="module")
def setup():
    spheres = compute_spheres(16, 384.0, 0)
    scene = build_triangle_scene(spheres, DL, DJ)
    det = sw.detect_lat_long_spheres(scene, DL, DJ)
    assert det is not None
    centers, radii = det
    soup = {k: np.asarray(v) for k, v in scene.soup().items()}
    v1 = np.stack([soup[f"v1{a}"] for a in "xyz"], 1)
    e1 = np.stack([soup[f"e1{a}"] for a in "xyz"], 1)
    e2 = np.stack([soup[f"e2{a}"] for a in "xyz"], 1)
    return scene, centers, radii, (v1, e1, e2, soup["mesh_id"])


def brute_nearest(o, d, geo):
    v1, e1, e2, mid = geo
    p = np.cross(d, e2)
    det = (e1 * p).sum(1)
    ok = np.abs(det) >= 1e-6
    rcp = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tv = o - v1
    u = (tv * p).sum(1) * rcp
    q = np.cross(tv, e1)
    vv = (d[None, :] * q).sum(1) * rcp
    th = (e2 * q).sum(1) * rcp
    val = ok & (u >= 0) & (u <= 1) & (vv >= 0) & (u + vv <= 1) & (th >= 1e-6)
    th = np.where(val, th, np.inf)
    k = th.argmin()
    return (th[k], mid[k]) if np.isfinite(th[k]) else (-1.0, -1)


def run_shell(centers, radii, o, d):
    riu = sw.unit_inner_radius(DL, DJ)
    m_count = centers.shape[0]

    def fetch(m):
        return (jnp.float32(centers[m, 0]), jnp.float32(centers[m, 1]),
                jnp.float32(centers[m, 2]), jnp.float32(radii[m]))

    f = jax.jit(lambda *a: sw.shell_nearest(DL, DJ, riu, m_count, fetch, *a))
    args = [jnp.asarray(x, jnp.float32)
            for x in (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])]
    t, m, pend = (np.asarray(x) for x in f(*args))
    return t, m, pend


def check(o, d, centers, radii, geo, max_pending):
    t, m, pend = run_shell(centers, radii, o, d)
    assert pend.mean() <= max_pending
    bad = 0
    for i in range(o.shape[0]):
        if pend[i]:
            continue
        rt, rm = brute_nearest(o[i], d[i], geo)
        if (t[i] < 0) != (rt < 0):
            bad += 1
        elif rt >= 0 and (m[i] != rm or abs(t[i] - rt) > 1e-3 * max(rt, 1)):
            bad += 1
    # Procedural trig can flip epsilon-boundary hits on isolated rays.
    assert bad <= max(2, o.shape[0] // 1000), f"{bad} mismatches"


def test_bounce_rays(setup):
    scene, centers, radii, geo = setup
    rng = np.random.default_rng(3)
    n = 1024
    m0 = rng.integers(0, centers.shape[0], n)
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    o = centers[m0] + nrm * (radii[m0] * 0.995)[:, None]
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    flip = (d * nrm).sum(1) < 0
    d[flip] -= 2 * (d[flip] * nrm[flip]).sum(1, keepdims=True) * nrm[flip]
    o = o + 0.01 * d
    check(o, d, centers, radii, geo, max_pending=0.01)


def test_outside_rays(setup):
    scene, centers, radii, geo = setup
    rng = np.random.default_rng(4)
    n = 1024
    o = rng.normal(size=(n, 3))
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 500.0
    tgt = rng.uniform(-192, 192, (n, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    check(o, d, centers, radii, geo, max_pending=0.01)


def test_detection_rejects_non_spheres(setup):
    scene, centers, radii, geo = setup
    import dataclasses
    # Perturb one vertex beyond tolerance: no longer a lat/long sphere.
    v = np.asarray(scene.vertices).copy()
    v[7] += 0.2 * radii[0]
    broken = dataclasses.replace(scene, vertices=jnp.asarray(v))
    assert sw.detect_lat_long_spheres(broken, DL, DJ) is None
    # Wrong tessellation parameters are rejected too.
    assert sw.detect_lat_long_spheres(scene, DL + 2, DJ) is None
