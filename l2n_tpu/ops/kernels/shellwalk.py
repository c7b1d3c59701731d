"""Procedural shell-walk intersector for lat/long-tessellated sphere meshes.

The memory-based triangle kernel pays a LOCKSTEP-UNION tax on bounce
casts: each ray enters ~1.2 mesh bounds, but the union over a (32,128)
lane block is ~90 of 128 meshes (measured), and every lane sweeps every
union mesh's triangles from SMEM. The union is irreducible for gathered
geometry — but the reference's triangle scene is PROCEDURAL: every mesh
is `tessellate_sphere(center, radius, disc_lat, disc_long)`
(/root/reference/src/main.cpp:607-654), so a triangle's vertices can be
RECOMPUTED per lane from (center, radius, cell index) instead of fetched.
Recomputing sidesteps the union entirely — each lane works on its OWN
candidate mesh, divergence-free in the only sense the TPU cares about
(no data-dependent memory access, only data-dependent arithmetic).

Per bounce ray:
  1. Shell sweep (fully unrolled over all meshes, sphere-kernel style):
     find the K nearest mesh SHELLS the ray pierces, sorted by outer-entry
     t. A mesh's surface lives entirely between its inscribed sphere
     (r_in = unit_inner_radius * r) and its vertex sphere (r).
  2. For each candidate in order: the ray's chord through that shell
     [outer entry .. inner entry | outer exit] projects to a short arc of
     lat/long cells (94% of hits stay in ONE phi cell; 99.9% span <= 3).
     Reconstruct the <= 6x5-cell window's vertices procedurally (two
     sincos + angle-addition recurrences) and run Möller-Trumbore on its
     <= 60 triangles. A confirmed hit at t <= next candidate's entry is
     final (a hit inside a shell can never precede that shell's entry).
  3. Lanes that exhaust K candidates, have wide chords (near-pole or
     grazing), or start inside an inscribed sphere are flagged PENDING —
     the caller resolves them with the classical gated mesh-sweep walk,
     whose work list is then usually empty.

Geometry is reconstructed with in-kernel sin/cos, which differs from the
host tessellation's numpy sin/cos by ~1 ulp: hit decisions can flip on
Möller-Trumbore epsilon boundaries — the same isolated-pixel class the
statistical parity gates budget (SURVEY §7(b)).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from l2n_tpu.maths.fastmath import atan2

BIG = 3.0e38
_MT_EPS = 1e-6          # EPSILON, triangle_pathtracing.cs.glsl:10
# Fixed candidate window (cells): covers chord spans si <= 3, sj <= 2 with
# a one-cell margin on each side (measured: 99.93% of hits; 0 coverage
# misses in 4k-ray simulation). Wider chords go PENDING.
_WIN_I = 6
_WIN_J = 5
_MAX_SPAN_I = 3
_MAX_SPAN_J = 2


def unit_inner_radius(disc_lat: int, disc_long: int) -> float:
    """Min distance from center to any face plane of the UNIT lat/long
    tessellation — scale-invariant, so r_in(mesh) = r * this."""
    from l2n_tpu.scene.tessellate import tessellate_sphere
    v, _, _, idx = tessellate_sphere(np.zeros(3), 1.0, disc_lat, disc_long)
    tri = idx.reshape(-1, 3)
    a, b, c = v[tri[:, 0]], v[tri[:, 1]], v[tri[:, 2]]
    n = np.cross(b - a, c - a)
    ln = np.linalg.norm(n, axis=1)
    ok = ln > 1e-6 * ln.max()
    return float((np.abs((n[ok] * a[ok]).sum(1)) / ln[ok]).min())


def detect_lat_long_spheres(scene, disc_lat: int, disc_long: int):
    """(centers (M,3), radii (M,)) if every mesh is exactly a
    tessellate_sphere(center, radius, disc_lat, disc_long) vertex grid
    (reference scene and OBJ re-exports qualify; arbitrary meshes return
    None and the caller keeps the memory-based kernel)."""
    from l2n_tpu.scene.tessellate import (
        tessellate_sphere,
        tessellate_sphere_info,
    )
    v_count, i_count = tessellate_sphere_info(disc_lat, disc_long)
    verts = np.asarray(scene.vertices)
    m_count = int(scene.mesh_count)
    if verts.shape[0] != m_count * v_count:
        return None
    if not np.array_equal(np.asarray(scene.triangle_count),
                          np.full(m_count, i_count // 3, np.int32)):
        return None
    grids = verts.reshape(m_count, disc_long + 1, disc_lat + 1, 3)
    # South pole row is (0,-1,0)*r + c repeated; north +r.
    south = grids[:, 0].mean(1)
    north = grids[:, -1].mean(1)
    centers = 0.5 * (south + north)
    radii = 0.5 * np.linalg.norm(north - south, axis=1)
    if (radii <= 0).any():
        return None
    for m in range(m_count):
        want, _, _, _ = tessellate_sphere(centers[m], float(radii[m]),
                                          disc_lat, disc_long)
        if not np.allclose(verts[m * v_count:(m + 1) * v_count], want,
                           atol=1e-3 * float(radii[m]) + 1e-6):
            return None
    return centers.astype(np.float32), radii.astype(np.float32)


def _shell_candidates(mesh_count, fetch_cr, k_slots,
                      ox, oy, oz, dx, dy, dz):
    """Top-k_slots nearest shell entries, fully unrolled over all meshes.

    fetch_cr(m) -> (cx, cy, cz, r) SMEM scalars. Returns
    [(ta_0, m_0), ...] ascending: ta = clamped outer-entry t (0 when the
    origin is already inside the shell — every bounce ray is, for its OWN
    mesh); m = -1 sentinel for empty slots."""
    f32 = jnp.float32
    shape = jnp.broadcast_shapes(jnp.shape(ox), jnp.shape(dx))
    big = f32(BIG)
    slots_t = [jnp.full(shape, big, f32) for _ in range(k_slots)]
    slots_m = [jnp.full(shape, -1, jnp.int32) for _ in range(k_slots)]

    for m in range(mesh_count):
        cx, cy, cz, r = fetch_cr(m)
        ro_x, ro_y, ro_z = ox - cx, oy - cy, oz - cz
        hb = ro_x * dx + ro_y * dy + ro_z * dz
        cc = ro_x * ro_x + ro_y * ro_y + ro_z * ro_z - (r * r) * f32(1.0 + 3e-4)
        disc = hb * hb - cc
        # Reaches the shell with some t >= 0 (inside counts, t = 0).
        has = (disc >= 0.0) & ((hb < 0.0) | (cc < 0.0))
        sq = jnp.sqrt(jnp.maximum(disc, f32(0.0)))
        ta = jnp.maximum(-hb - sq, f32(0.0))
        t = jnp.where(has, ta, big)
        mi = jnp.int32(m)
        # Insertion into the sorted slots (ascending).
        cmps = [t < st for st in slots_t]
        for k in range(k_slots - 1, 0, -1):
            slots_t[k] = jnp.where(cmps[k - 1], slots_t[k - 1],
                                   jnp.where(cmps[k], t, slots_t[k]))
            slots_m[k] = jnp.where(cmps[k - 1], slots_m[k - 1],
                                   jnp.where(cmps[k], mi, slots_m[k]))
        slots_t[0] = jnp.where(cmps[0], t, slots_t[0])
        slots_m[0] = jnp.where(cmps[0], mi, slots_m[0])
    return list(zip(slots_t, slots_m))


def _window_try(disc_lat, disc_long, r_in_unit, fetch_cr, mesh_count,
                active, m_id, ox, oy, oz, dx, dy, dz):
    """Test `m_id`'s (per-lane) candidate window; returns (t_hit, wide).

    t_hit = BIG when no triangle of the window is hit (or the lane is
    inactive / wide). All geometry is recomputed from (center, radius,
    cell); the only per-lane-indexed data are the 4 scalars of the
    candidate mesh, fetched by an unrolled select scan over the mesh list
    (the price of divergence-freedom: ~5 ops per mesh)."""
    f32 = jnp.float32
    shape = jnp.shape(m_id)
    big = f32(BIG)
    d_phi = 2.0 * np.pi / disc_lat
    d_theta = np.pi / disc_long

    # Select-scan fetch of the candidate's (cx, cy, cz, r).
    cx = jnp.zeros(shape, f32)
    cy = jnp.zeros(shape, f32)
    cz = jnp.zeros(shape, f32)
    r = jnp.ones(shape, f32)
    for m in range(mesh_count):
        scx, scy, scz, sr = fetch_cr(m)
        sel = m_id == m
        cx = jnp.where(sel, scx, cx)
        cy = jnp.where(sel, scy, cy)
        cz = jnp.where(sel, scz, cz)
        r = jnp.where(sel, sr, r)

    # Shell chord [t_a, t_b] relative to this mesh.
    ro_x, ro_y, ro_z = ox - cx, oy - cy, oz - cz
    hb = ro_x * dx + ro_y * dy + ro_z * dz
    r_out2 = (r * r) * f32(1.0 + 3e-4)
    cc = ro_x * ro_x + ro_y * ro_y + ro_z * ro_z - r_out2
    sq = jnp.sqrt(jnp.maximum(hb * hb - cc, f32(0.0)))
    t_a = jnp.maximum(-hb - sq, f32(0.0))
    r_in2 = (r * r) * f32(r_in_unit * r_in_unit * (1.0 - 3e-4))
    ci = ro_x * ro_x + ro_y * ro_y + ro_z * ro_z - r_in2
    di = hb * hb - ci
    crossing = (hb < 0.0) & (di >= 0.0) & (ci >= 0.0)
    t_b = jnp.where(crossing,
                    -hb - jnp.sqrt(jnp.maximum(di, f32(0.0))),
                    -hb + sq)
    t_b = jnp.maximum(t_b, t_a)
    inside_inner = ci < 0.0  # chord spans the whole sphere -> pending

    # Entry / exit cells.
    def cell_of(px, py, pz):
        inv = jax.lax.rsqrt(jnp.maximum(
            px * px + py * py + pz * pz, f32(1e-20)))
        y = py * inv
        j = jnp.zeros(shape, jnp.int32)
        for k in range(1, disc_long):
            j = j + (y > f32(np.sin(-np.pi / 2 + k * d_theta))).astype(
                jnp.int32)
        phi = atan2(px, pz)
        phi = jnp.where(phi < 0.0, phi + f32(2.0 * np.pi), phi)
        i = jnp.clip((phi * f32(1.0 / d_phi)).astype(jnp.int32),
                     0, disc_lat - 1)
        return i, j

    i1, j1 = cell_of(ro_x + t_a * dx, ro_y + t_a * dy, ro_z + t_a * dz)
    i2, j2 = cell_of(ro_x + t_b * dx, ro_y + t_b * dy, ro_z + t_b * dz)
    fwd = jnp.remainder(i2 - i1, disc_lat)        # i1 -> i2 going +phi
    bwd = jnp.remainder(i1 - i2, disc_lat)
    si = jnp.minimum(fwd, bwd)
    sj = jnp.abs(j1 - j2)
    wide = (si > _MAX_SPAN_I) | (sj > _MAX_SPAN_J) | inside_inner
    # Window start: one-cell margin before the "earlier" endpoint in the
    # shorter wrap direction.
    i0 = jnp.where(fwd <= _MAX_SPAN_I, i1, i2) - 1
    j0 = jnp.clip(jnp.minimum(j1, j2) - 1, 0,
                  max(disc_long - _WIN_J, 0))
    win_j = min(_WIN_J, disc_long)

    # Trig rows/cols by angle-addition recurrence from one sincos each.
    th0 = f32(-np.pi / 2) + j0.astype(f32) * f32(d_theta)
    sin_t = [jnp.sin(th0)]
    cos_t = [jnp.cos(th0)]
    sdt, cdt = f32(np.sin(d_theta)), f32(np.cos(d_theta))
    for _ in range(win_j):
        s, c = sin_t[-1], cos_t[-1]
        sin_t.append(s * cdt + c * sdt)
        cos_t.append(c * cdt - s * sdt)
    ph0 = i0.astype(f32) * f32(d_phi)
    sin_p = [jnp.sin(ph0)]
    cos_p = [jnp.cos(ph0)]
    sdp, cdp = f32(np.sin(d_phi)), f32(np.cos(d_phi))
    for _ in range(_WIN_I):
        s, c = sin_p[-1], cos_p[-1]
        sin_p.append(s * cdp + c * sdp)
        cos_p.append(c * cdp - s * sdp)

    def vert(jj, ii):
        # n = (sin(phi) cos(theta), sin(theta), cos(phi) cos(theta)),
        # v = c + r n — relative to the center (the ray is already
        # relative), so v == r n.
        vx = r * (sin_p[ii] * cos_t[jj])
        vy = r * sin_t[jj]
        vz = r * (cos_p[ii] * cos_t[jj])
        return vx, vy, vz

    eps = f32(_MT_EPS)
    best = jnp.full(shape, big, f32)

    def mt(v1, v2, v3, best):
        v1x, v1y, v1z = v1
        e1x, e1y, e1z = v2[0] - v1x, v2[1] - v1y, v2[2] - v1z
        e2x, e2y, e2z = v3[0] - v1x, v3[1] - v1y, v3[2] - v1z
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        det_ok = jnp.abs(det) >= eps
        rcp = f32(1.0) / jnp.where(det_ok, det, f32(1.0))
        tx, ty, tz = ro_x - v1x, ro_y - v1y, ro_z - v1z
        u = (tx * px + ty * py + tz * pz) * rcp
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * rcp
        th = (e2x * qx + e2y * qy + e2z * qz) * rcp
        valid = (det_ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                 & (u + v <= 1.0) & (th >= eps))
        return jnp.minimum(best, jnp.where(valid, th, big))

    # win_j x _WIN_I CELLS; vertex row/column lists hold one more entry
    # than cells (built above with win_j + 1 / _WIN_I + 1 entries).
    for jj in range(win_j):
        for ii in range(_WIN_I):
            # Quad (i, j): tris (v(j,i), v(j,i+1), v(j+1,i+1)) and
            # (v(j,i), v(j+1,i+1), v(j+1,i)) — reference winding
            # (src/main.cpp:642-653).
            a = vert(jj, ii)
            b = vert(jj, ii + 1)
            c = vert(jj + 1, ii + 1)
            d_ = vert(jj + 1, ii)
            best = mt(a, b, c, best)
            best = mt(a, c, d_, best)

    ok = active & ~wide
    return jnp.where(ok, best, big), wide


def shell_nearest(disc_lat, disc_long, r_in_unit, mesh_count, fetch_cr,
                  ox, oy, oz, dx, dy, dz,
                  k_slots: int = 4, k_gated: int = 0):
    """Nearest procedural hit. Returns (t, mesh, pending): t = BIG where
    no hit was confirmed; `pending` lanes need the fallback mesh walk
    (wide chords, inscribed-sphere starts, or candidates beyond k_slots).
    `k_gated` wraps that many final tries in a block-level cond — default
    0: the 4th try is needed by ~80% of blocks at the reference workload,
    and Mosaic cannot carry i1 vectors through `scf.if` anyway."""
    f32 = jnp.float32
    shape = jnp.broadcast_shapes(jnp.shape(ox), jnp.shape(dx))
    big = f32(BIG)
    slots = _shell_candidates(mesh_count, fetch_cr, k_slots,
                              ox, oy, oz, dx, dy, dz)
    best_t = jnp.full(shape, big, f32)
    best_m = jnp.full(shape, -1, jnp.int32)
    done = slots[0][1] < 0          # no candidate at all -> clean miss
    pending = jnp.zeros(shape, bool)

    def one_try(k, state):
        best_t, best_m, done, pending = state
        ta_k, m_k = slots[k]
        active = ~done & (m_k >= 0)
        t_hit, wide = _window_try(disc_lat, disc_long, r_in_unit, fetch_cr,
                                  mesh_count, active, jnp.maximum(m_k, 0),
                                  ox, oy, oz, dx, dy, dz)
        pending = pending | (active & wide)
        better = active & (t_hit < best_t)
        best_t = jnp.where(better, t_hit, best_t)
        best_m = jnp.where(better, m_k, best_m)
        if k + 1 < k_slots:
            next_t, next_m = slots[k + 1]
            no_next = next_m < 0
            resolved = active & ~wide & ((best_t <= next_t) | no_next)
        else:
            # Out of slots: confirmed hits are final; everything else that
            # was still active goes to the fallback walk.
            resolved = active & ~wide & (best_t < big)
            pending = pending | (active & ~resolved)
        done = done | resolved
        return best_t, best_m, done, pending

    state = (best_t, best_m, done, pending)
    for k in range(k_slots - k_gated):
        state = one_try(k, state)
    for k in range(k_slots - k_gated, k_slots):
        # Rarely-needed deep tries: skipped wholesale when every lane of
        # the block is already resolved.
        need = jnp.any(~state[2] & (slots[k][1] >= 0))
        state = jax.lax.cond(need, lambda s: one_try(k, s), lambda s: s,
                             state)
    best_t, best_m, done, pending = state
    # Unresolved non-pending lanes (e.g. k_gated try skipped for the block
    # while this lane still had candidates) -> pending.
    pending = pending | (~done & (slots[0][1] >= 0))
    t = jnp.where(best_t < big, best_t, f32(-1.0))
    return t, best_m, pending
