"""Fused triangle path-tracing kernel (two-level: mesh bounds -> triangles).

TPU-native rebuild of /root/reference/src/shaders/triangle_pathtracing.cs.glsl.
The reference brute-forces 128 meshes x 256 triangles per ray (glsl:164-175).
A lockstep TPU sweep of all 32k triangles per bounce would be pure VPU burn,
so this kernel adds the acceleration structure the scene begs for (and the
reference lacks — beating it is the point):

  1. PRIMARY casts use the same per-tile cone cull as the sphere kernel,
     applied to mesh bounding spheres: a host-side, per-camera-cached table
     lists the meshes whose bounds meet each tile's view cone (typically a
     handful of 128), and the kernel loops over exactly those.
  2. BOUNCE casts on lat/long-tessellated sphere scenes (the reference
     scene — detected exactly) use the PROCEDURAL SHELLWALK
     (ops/kernels/shellwalk.py): each lane recomputes its own candidate
     meshes' triangles from (center, radius, cell index), sidestepping
     the lockstep-union tax entirely (a (32,128) block's rays
     collectively enter ~90 of 128 mesh bounds, though each ray enters
     ~1.2 — memory-based sweeps pay the union). The <0.1% of rays the
     shellwalk cannot bound (near-pole / grazing chords, inscribed-sphere
     starts) fall back to a work-list mesh walk whose flags are built
     branch-free in one unrolled pass and compacted by a scalar loop.
     Non-procedural scenes (OBJ) always use the work-list walk.
  3. The LAST path segment only feeds the environment test (see
     ops/pathtrace.py), so its fallback runs a boolean any-hit
     Möller-Trumbore sweep — no winner tracking, no interpolation.

Surviving meshes stream their triangle block from HBM into SMEM with an
async DMA (the TPU analog of the reference's bindless pointer chase,
triangle_pathtracing.cs.glsl:34-36) and run the Möller-Trumbore sweep with
candidate-time attribute interpolation (glsl:111-154,186-187).

Sky tiles touch zero triangles; typical tiles a handful of meshes.
"""

from __future__ import annotations

from functools import partial
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from l2n_tpu.camera.camera import ROW_PROJ
from l2n_tpu.ops.kernels import register_kernel
from l2n_tpu.ops.kernels.common import (
    accumulate_and_tonemap,
    interpret_mode,
    make_kernel_sampler,
    tile_pixel_coords,
)
from l2n_tpu.ops.pathtrace import Hit, generate_rays, shade
from l2n_tpu.render.state import FrameState
from l2n_tpu.render.tiles import advance_offset, scheduled_tiles
from l2n_tpu.scene.tessellate import TriangleScene

# Row indices of the per-mesh triangle block (see pack_mesh_blocks).
# Normals/texcoords are stored in affine form (base + per-barycentric
# deltas): attr(u, v) = base + u*db + v*dc — two FMAs per component instead
# of the three-weight form.
_V1, _E1, _E2, _NA, _DNB, _DNC = 0, 3, 6, 9, 12, 15
_TA, _DTB, _DTC = 18, 20, 22
_N_ROWS = 24

# Work-unit geometry. Triangles are spatially sorted per mesh (recursive
# median split), then grouped into fixed 128-triangle SLABS — the DMA and
# work-list granularity. SMEM staging is one (24, 128) slab no matter how
# large a mesh gets (the previous whole-mesh staging made the scratch —
# and the unrolled sweep code — scale with the LARGEST mesh: a 768-tri
# torus field took a 9-minute Mosaic compile and 40 ms/frame-spp).
# Within a slab, _SUBS sub-cluster bounds of 16 triangles gate the
# unrolled Möller-Trumbore sweeps (the successor of the round-2
# 8-clusters-per-mesh scheme, 155 -> 124 ms/frame-spp then).
import os as _os

_SLAB = int(_os.environ.get("L2N_TRI_SLAB", "128"))
_SUBS = int(_os.environ.get("L2N_TRI_SUBS", "8"))
# Non-divisor settings would truncate: _SUBS*_SUBSIZE < _SLAB would leave
# the tail triangles of every slab outside every sub-cluster, silently
# never intersected (wrong image + misleadingly fast sweeps).
if _SLAB % 128 != 0 or _SLAB <= 0:
    raise ValueError(
        f"L2N_TRI_SLAB={_SLAB}: must be a positive multiple of 128 "
        "(lane alignment of the slab DMA)")
if _SUBS <= 0 or _SLAB % _SUBS != 0:
    raise ValueError(
        f"L2N_TRI_SUBS={_SUBS}: must divide L2N_TRI_SLAB={_SLAB} exactly "
        "(otherwise slab-tail triangles fall outside every sub-cluster)")
_SUBSIZE = _SLAB // _SUBS
# Structural A/B knobs (results identical either way; only timing moves):
# L2N_TRI_DB=0 makes the work-list walks stage slabs SYNCHRONOUSLY with the
# mask-gated copy instead of double-buffered unconditional prefetch;
# L2N_TRI_PRIMARY routes OBJ primaries: "cone" = the cone-culled
# nested-loop sweep, "walk" = the seeded work-list walk, "auto" (default)
# = walk exactly when the slab-GROUP hierarchy is active (see below —
# one huge mesh defeats per-mesh cone gating). Defaults are the measured
# winners (benchmarks/PROFILE.md round-4 walk ablations + round-5 big-mesh
# scaling).
_DOUBLE_BUF = _os.environ.get("L2N_TRI_DB", "1") != "0"
_PRIMARY_MODE = _os.environ.get("L2N_TRI_PRIMARY", "auto")
if _PRIMARY_MODE not in ("cone", "walk", "auto"):
    raise ValueError(f"L2N_TRI_PRIMARY={_PRIMARY_MODE}: cone|walk|auto")
# Slab-GROUP hierarchy (round-5, the 'Embree analog' frontier): scenes
# whose static (mesh, slab) work list exceeds _HIER_MIN items get a
# second bound level — _GROUP consecutive slabs per group — so the
# branch-free flag pass unrolls over ~S/_GROUP group bounds and only the
# entered groups pay per-slab tests (rolled). A single ~70k-triangle mesh
# has ~550 slabs: flat, the unrolled pass is ~11k vector ops per walk and
# the Mosaic program scales with it; grouped it is ~70 unrolled items.
# Threshold 200, measured on the v5e (benchmarks/PROFILE.md round-5
# big-mesh scaling): the reference triangle scene (256 items) WINS under
# the hierarchy (17.2 -> 15.9 ms/frame-spp — its shellwalk pending/any-hit
# flag passes get 8x cheaper), the torus field (144 items) stays on the
# r4 flat path (its hier probe measured 14.4 vs 12.6), the 70k trefoil
# (548 items) is the 3.7x headline win (17.2 vs 63.8 flat).
def _hier_min() -> int:
    """Read at BUILD time (not import) so tests can force both paths."""
    return int(_os.environ.get("L2N_TRI_HIER_MIN", "200"))


_GROUP = int(_os.environ.get("L2N_TRI_GROUP", "8"))
if _GROUP <= 0 or (_GROUP & (_GROUP - 1)) != 0:
    # Power of two => gsub = min(_GROUP, spp) divides spp (also a power of
    # two), so a group's padded slab range g*gsub+[0, gsub) stays inside
    # its mesh's spp-wide flag-lane window — a non-divisor would let the
    # compact pass read another mesh's flag lanes.
    raise ValueError(f"L2N_TRI_GROUP={_GROUP}: must be a power of two")

_ABLATE_WARNED = False


def _ablate_mode() -> str:
    """Read L2N_TRI_ABLATE (benchmarks/obj_walk.py timing probes) and warn
    LOUDLY the first time it is non-empty: noflags changes the work list,
    nodma/nowalk produce garbage images (stale SMEM / skipped sweeps). A
    leaked variable in a normal render or test run must not be silent."""
    mode = _os.environ.get("L2N_TRI_ABLATE", "")
    global _ABLATE_WARNED
    if mode and not _ABLATE_WARNED:
        _ABLATE_WARNED = True
        import sys
        print(f"*** L2N_TRI_ABLATE={mode!r}: ABLATION TIMING PROBE — "
              "rendered images are NOT correct (stale SMEM / altered "
              "work list). Unset it for real renders. ***",
              file=sys.stderr, flush=True)
    return mode


def _spatial_order(cents: np.ndarray) -> np.ndarray:
    """Spatial sort of triangle centroids: recursive median split along
    the longest axis, split points snapped to slab (then sub-cluster)
    multiples so the kernel's fixed-size consecutive runs stay spatially
    compact."""
    def rec(order):
        n = len(order)
        if n <= _SUBSIZE:
            return [order]
        axis = int(np.argmax(cents[order].max(0) - cents[order].min(0)))
        srt = order[np.argsort(cents[order][:, axis], kind="stable")]
        q = _SLAB if n > 2 * _SLAB else _SUBSIZE
        half = min(max(q, ((n // 2 + q // 2) // q) * q), n - 1)
        return rec(srt[:half]) + rec(srt[half:])
    if len(cents) == 0:
        return np.arange(0)
    return np.concatenate(rec(np.arange(len(cents))))


def _bsphere(pts: np.ndarray) -> tuple[np.ndarray, float]:
    center = 0.5 * (pts.min(0) + pts.max(0))
    r2 = float(((pts - center) ** 2).sum(1).max()) * (1.0 + 1e-5)
    return center, r2


# Interior certain-hit balls per mesh (see _interior_balls).
_BALLS = int(_os.environ.get("L2N_TRI_BALLS", "8"))


def _point_tri_dist(p: np.ndarray, a: np.ndarray, b: np.ndarray,
                    c: np.ndarray) -> np.ndarray:
    """Exact point-to-triangle distances, batched: p (C,3) x tris (n,3)
    -> (C,n). Min of the in-face plane distance and the three edge-segment
    distances (which cover the vertex regions)."""
    def seg(p, a, d):  # p (C,3), a (n,3), d (n,3) -> (C,n)
        ap = p[:, None, :] - a[None, :, :]
        t = np.clip((ap * d).sum(-1)
                    / np.maximum((d * d).sum(-1), 1e-30), 0.0, 1.0)
        q = ap - t[..., None] * d
        return np.sqrt((q * q).sum(-1))

    ab, ac, bc = b - a, c - a, c - b
    n = np.cross(ab, ac)
    nn = np.maximum((n * n).sum(-1), 1e-30)
    ap = p[:, None, :] - a[None, :, :]
    dist_n = (ap * n).sum(-1) / np.sqrt(nn)
    # Barycentric coords of the plane projection.
    d00 = (ab * ab).sum(-1)
    d01 = (ab * ac).sum(-1)
    d11 = (ac * ac).sum(-1)
    d20 = (ap * ab).sum(-1)
    d21 = (ap * ac).sum(-1)
    denom = np.maximum(d00 * d11 - d01 * d01, 1e-30)
    v = (d11 * d20 - d01 * d21) / denom
    w = (d00 * d21 - d01 * d20) / denom
    inside = (v >= 0.0) & (w >= 0.0) & (v + w <= 1.0)
    edge = np.minimum(np.minimum(seg(p, a, ab), seg(p, a, ac)),
                      seg(p, b, bc))
    return np.where(inside, np.abs(dist_n), edge)


def _solid_angle_inside(p: np.ndarray, a: np.ndarray, b: np.ndarray,
                        c: np.ndarray) -> np.ndarray:
    """True per candidate point (C,3) iff the summed signed solid angle of
    the closed mesh (tris (n,3) x3) around it is ~4pi (inside the solid).
    van Oosterom-Strackee, same formulation as the inscribed-sphere test."""
    ra = a[None] - p[:, None]
    rb = b[None] - p[:, None]
    rc = c[None] - p[:, None]
    la = np.linalg.norm(ra, axis=-1)
    lb = np.linalg.norm(rb, axis=-1)
    lc = np.linalg.norm(rc, axis=-1)
    num = (ra * np.cross(rb, rc)).sum(-1)
    den = (la * lb * lc + (ra * rb).sum(-1) * lc
           + (ra * rc).sum(-1) * lb + (rb * rc).sum(-1) * la)
    omega = 2.0 * np.arctan2(num, den)
    area2 = np.linalg.norm(np.cross(rb - ra, rc - ra), axis=-1)
    total = np.where(area2 > 1e-12, omega, 0.0).sum(-1)
    return np.abs(np.abs(total) - 4.0 * np.pi) < 1e-2


def _canonical_vertex_ids(verts: np.ndarray) -> np.ndarray:
    """Vertex ids canonicalized by position (merging the seam/pole
    duplicates tessellators and OBJ exporters emit). Compute ONCE per
    scene and pass to every per-mesh `_mesh_watertight` call.

    Exact byte identity is not enough: the tessellation's longitude seam
    computes the same logical vertex through phi=0 and phi=2pi trig
    paths, which differ in the last ulp (measured: 12/16 tessellated
    spheres pass bytewise, all 16 with tolerance). Duplicates are merged
    by connected components over pairs closer than eps = 1e-6 x scene
    extent — orders of magnitude above float noise, orders below any
    real vertex spacing. A crack narrower than eps merges closed (it
    could leak only an eps-wide sliver of rays); a genuinely missing
    face still FAILS the manifold check, since no vertex merge pairs
    its boundary edges (the advisor's imported-OBJ threat model)."""
    pts = np.ascontiguousarray(np.asarray(verts, np.float32))
    n = len(pts)
    if n == 0:
        return np.zeros((0,), np.int64)
    extent = float(pts.max(0).__sub__(pts.min(0)).max()) or 1.0
    try:  # scipy ships with jax here, but gate it: exact-byte merging is
        # a sound (conservative) fallback — ulp seams then fail watertight
        # and certain-hit data is simply not built for those meshes.
        from scipy.spatial import cKDTree
    except ImportError:
        _, canon = np.unique(pts.view([("", np.float32)] * 3).reshape(-1),
                             return_inverse=True)
        return canon
    pairs = cKDTree(pts).query_pairs(1e-6 * extent, output_type="ndarray")
    parent = np.arange(n)

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    for i, j in pairs:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    canon = np.fromiter((find(i) for i in range(n)), np.int64, n)
    return canon


def _mesh_watertight(verts: np.ndarray, tris: np.ndarray,
                     canon: np.ndarray | None = None) -> bool:
    """Combinatorial watertightness on the INDEXED topology: every
    undirected edge of the live faces shared by exactly two faces
    (2-manifold without boundary). The solid-angle certification alone
    accepts a mesh that is watertight except for a hole subtending
    < 1e-2 sr from the candidate point — common in imported OBJs — which
    would make the certain-hit balls unsound for rays through the crack
    (false shadows / missed hits).

    Operates on the scene's ORIGINAL vertex buffer + face indices (NOT
    the soup's v1+e1 reconstructions, whose float32 edge rounding breaks
    bit-identity of shared corners). Vertex ids are first canonicalized
    by position with an eps tolerance (`_canonical_vertex_ids`), merging
    the seam/pole duplicates tessellators and OBJ exporters emit — incl.
    seams whose two trig paths differ in the last ulp. A mesh that still
    fails is conservatively treated as open — certain-hit data is an
    optimization, never required for the walk's correctness. Faces
    with two corners on the SAME canonical point (the tessellation's
    pole slivers) are dropped before counting: the surviving face of
    each collapsed quad carries the shared edges."""
    if canon is None:
        canon = _canonical_vertex_ids(verts)
    a, b, c = canon[tris[:, 0]], canon[tris[:, 1]], canon[tris[:, 2]]
    live = (a != b) & (b != c) & (a != c)
    a, b, c = a[live], b[live], c[live]
    if a.size == 0:
        return False
    edges = np.concatenate([np.stack([a, b], 1), np.stack([b, c], 1),
                            np.stack([c, a], 1)], 0)
    edges.sort(axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    return bool((counts == 2).all())


def _interior_balls(v1, v2, v3, sub_centers, sub_radii) -> np.ndarray:
    """Up to _BALLS certain-hit balls strictly inside one closed mesh.

    A ball fully contained in a closed mesh's solid bounds the nearest
    surface hit of any outside-origin ray that crosses it: the ray passes
    from outside the solid to an interior point, so it crosses the surface
    no later than ball entry. This generalizes the central inscribed
    sphere (inner_gap) to meshes whose bound center lies OUTSIDE the
    solid — a torus's center sits in its hole, so the central shortcut
    never fires and bounce/any-hit walks had no upper bound at all on
    such scenes (the r2 wishlist analog of a BVH's internal occupancy).

    Candidates: sub-cluster centroids stepped inward along the mean
    inward surface normal at several depths; kept if the solid-angle test
    says inside and the exact point-triangle distance gives a positive
    radius (shrunk 1e-3 for strict containment); greedily selected
    largest-first with a spread constraint. Returns (K, 4) [cx cy cz r2],
    dead entries r2 = -1.
    """
    out = np.full((_BALLS, 4), -1.0, np.float32)
    n_geo = np.cross(v2 - v1, v3 - v1)
    ln = np.linalg.norm(n_geo, axis=1, keepdims=True)
    ok = ln[:, 0] > 1e-12
    if not ok.any():
        return out
    # Orient: signed volume > 0 <=> cross(e1,e2) points outward.
    vol6 = float((v1 * np.cross(v2, v3)).sum())
    sign = 1.0 if vol6 > 0.0 else -1.0
    cents = (v1 + v2 + v3) / 3.0
    normals = sign * n_geo / np.maximum(ln, 1e-30)

    # Mean inward normal per sub-cluster candidate seed. Cap the seed count
    # so the (candidates x triangles) inside/distance batches stay small on
    # huge meshes (a 1M-triangle mesh has ~8k subs; 64 spread seeds x 3
    # depths bound the host memory at ~200 x n floats).
    if len(sub_centers) > 64:
        stride = -(-len(sub_centers) // 64)
        sub_centers = sub_centers[::stride]
        sub_radii = sub_radii[::stride]
    cand = []
    for sc, sr in zip(sub_centers, sub_radii):
        d2 = ((cents - sc) ** 2).sum(1)
        near = d2 <= max(sr, 1e-6) ** 2 * 4.0
        if not near.any():
            continue
        inward = -normals[near].mean(0)
        nl = np.linalg.norm(inward)
        if nl < 1e-6:
            continue
        inward /= nl
        base = cents[near].mean(0)
        for h in (0.35, 0.7, 1.4):
            cand.append(base + inward * (h * max(sr, 1e-6)))
    if not cand:
        return out
    p = np.asarray(cand, np.float64)
    inside = _solid_angle_inside(p, v1, v2, v3)
    if not inside.any():
        return out
    p = p[inside]
    radii = _point_tri_dist(p, v1, v2, v3).min(-1) * (1.0 - 1e-3)
    good = radii > 1e-6
    p, radii = p[good], radii[good]
    order = np.argsort(-radii)
    chosen: list[int] = []
    for i in order:
        if len(chosen) >= _BALLS:
            break
        if all(np.linalg.norm(p[i] - p[j]) > 0.7 * max(radii[i], radii[j])
               for j in chosen):
            chosen.append(int(i))
    for k, i in enumerate(chosen):
        out[k] = [p[i, 0], p[i, 1], p[i, 2], radii[i] * radii[i]]
    return out


def pack_mesh_blocks(
        scene: TriangleScene) -> tuple[np.ndarray, np.ndarray, bool]:
    """Pack the soup into per-mesh slab blocks + bounding spheres.

    Returns (blocks (M, 24, Tpad) f32, bounds (M, 4) f32 [cx cy cz r^2],
    slab_bounds (M, S, 5) f32 [cx cy cz r^2 r], sub_bounds
    (M, S, _SUBS, 5) f32, slab_count (M,) i32, inner_gap (M,) f32,
    sphere_normals, balls (M, _BALLS, 4) f32 — interior certain-hit
    balls, dead entries r^2 = -1, see _interior_balls), where
    S = Tpad // _SLAB. Triangles are spatially
    sorted within each mesh (see _spatial_order) so each consecutive
    128-triangle slab — and each 16-triangle sub-run — is spatially
    compact. Padding triangles are all-zero (degenerate -> det = 0 ->
    rejected); empty slabs/subs get bound r^2 = -1e30 (never entered).

    `sphere_normals` is True when every mesh's vertex normals are exactly
    the unit radial directions of a sphere centered at its bound center —
    true for the reference's tessellated spheres (src/main.cpp:607-654:
    position = center + r*normal). Then the interpolated shading normal at
    barycentric (u, v) is, BY LINEARITY, (hit_point - center)/r — the exact
    value of the reference's per-candidate interpolation (glsl:186-187) —
    so kernels can skip the 9 attribute loads + interpolation per triangle
    candidate and recover normals once per ray. Detected numerically, so
    OBJ-loaded spheres qualify too and arbitrary meshes fall back.
    """
    # Disk cache for big meshes: packing is a pure host function of
    # (scene, slab/sub/ball knobs, trace-relevant sources), and the
    # certain-hit construction — exact point-triangle distances + signed
    # solid angles over ALL triangles per candidate — measures 85 s for a
    # 70k-triangle mesh (cProfile: _interior_balls ~76 s). Keyed beside
    # the AOT executable cache; small scenes (tests) skip the IO.
    cache_path = None
    if int(scene.total_triangles) >= 20_000:
        from l2n_tpu.utils import aot_cache
        # Keyed on THIS FILE's bytes (pack logic lives here), not the full
        # trace-relevant source digest: an edit to e.g. sphere_pt.py must
        # invalidate executables but need not repack 70k-mesh geometry.
        with open(__file__, "rb") as fh:
            pack_src = fh.read()
        key = aot_cache.digest(
            "tripack", pack_src,
            [np.asarray(x) for x in
             (scene.vertices, scene.normals, scene.tex_coords, scene.indices,
              scene.triangle_count, scene.index_offset)],
            (_SLAB, _SUBS, _BALLS))
        cache_dir = _os.environ.get("L2N_AOT_CACHE_DIR",
                                    aot_cache.DEFAULT_DIR)
        cache_path = _os.path.abspath(
            _os.path.join(cache_dir, f"tripack-{key[:24]}.npz"))
        if _os.path.exists(cache_path):
            try:
                z = np.load(cache_path)
                return (z["blocks"], z["bounds"], z["slab"], z["sub"],
                        z["scnt"], z["gap"], bool(z["sphn"]), z["balls"])
            except Exception:
                pass  # unreadable entry: repack

    soup = {k: np.asarray(v) for k, v in scene.soup().items()}
    mesh_id = soup["mesh_id"]
    m_count = int(scene.mesh_count)
    counts = np.bincount(mesh_id, minlength=m_count)
    tpad = max(_SLAB, int(-(-counts.max() // _SLAB) * _SLAB))

    # Affine attribute deltas (see row layout above).
    for a in "xyz":
        soup[f"dnb{a}"] = soup[f"nb{a}"] - soup[f"na{a}"]
        soup[f"dnc{a}"] = soup[f"nc{a}"] - soup[f"na{a}"]
    for a in "uv":
        soup[f"dtb{a}"] = soup[f"tb{a}"] - soup[f"ta{a}"]
        soup[f"dtc{a}"] = soup[f"tc{a}"] - soup[f"ta{a}"]
    rows = [
        "v1x", "v1y", "v1z", "e1x", "e1y", "e1z", "e2x", "e2y", "e2z",
        "nax", "nay", "naz", "dnbx", "dnby", "dnbz", "dncx", "dncy", "dncz",
        "tau", "tav", "dtbu", "dtbv", "dtcu", "dtcv",
    ]
    assert len(rows) == _N_ROWS
    blocks = np.zeros((m_count, _N_ROWS, tpad), np.float32)
    bounds = np.zeros((m_count, 4), np.float32)
    n_slabs = tpad // _SLAB
    slab_bounds = np.zeros((m_count, n_slabs, 5), np.float32)
    slab_bounds[:, :, 3] = -1e30
    sub_bounds = np.zeros((m_count, n_slabs, _SUBS, 5), np.float32)
    sub_bounds[:, :, :, 3] = -1e30
    slab_count = np.zeros((m_count,), np.int32)

    for m in range(m_count):
        sel = np.flatnonzero(mesh_id == m)
        n = len(sel)
        v1 = np.stack([soup[f"v1{a}"][sel] for a in "xyz"], 1)
        v2 = v1 + np.stack([soup[f"e1{a}"][sel] for a in "xyz"], 1)
        v3 = v1 + np.stack([soup[f"e2{a}"][sel] for a in "xyz"], 1)
        cents = (v1 + v2 + v3) / 3.0
        order = _spatial_order(cents)
        rows_sel = sel[order]
        for r, key in enumerate(rows):
            blocks[m, r, :n] = soup[key][rows_sel]
        tri_pts = np.stack([v1[order], v2[order], v3[order]], 1)  # (n, 3, 3)
        slab_count[m] = -(-n // _SLAB)
        for s in range(int(slab_count[m])):
            g = tri_pts[s * _SLAB:(s + 1) * _SLAB]
            center, r2 = _bsphere(g.reshape(-1, 3))
            slab_bounds[m, s] = [*center, r2, float(np.sqrt(r2))]
            for c in range(_SUBS):
                gg = g[c * _SUBSIZE:(c + 1) * _SUBSIZE]
                if len(gg) == 0:
                    continue
                center, r2 = _bsphere(gg.reshape(-1, 3))
                sub_bounds[m, s, c] = [*center, r2, float(np.sqrt(r2))]
        # Exact-conservative whole-mesh bound.
        if n:
            center, r2 = _bsphere(tri_pts.reshape(-1, 3))
            bounds[m] = [*center, r2]

    # Inner-sphere certain-hit data for the any-hit sweep: if a mesh is a
    # CLOSED surface (signed solid angle of its triangles around the bound
    # center sums to 4pi) then any ray crossing its inscribed sphere
    # (radius r_in = min plane distance) must hit a triangle — no sweep
    # needed for such rays. inner_gap = r_out^2 - r_in^2 (so in-kernel
    # c_inner = c_outer + inner_gap); +BIG disables the shortcut for open /
    # degenerate meshes. Like the interior balls below, the shortcut is
    # gated on COMBINATORIAL watertightness (ADVICE r3): the solid-angle
    # test alone accepts a mesh with a < 1e-2 sr crack, through which an
    # inscribed-sphere-certified hit would be unsound (false shadows /
    # missed hits for rays escaping the hole).
    scene_verts = np.asarray(scene.vertices)
    scene_tris = np.asarray(scene.indices).reshape(-1, 3)
    tri_offsets = np.asarray(scene.index_offset) // 3
    tri_counts = np.asarray(scene.triangle_count)
    canon_ids = _canonical_vertex_ids(scene_verts)
    watertight = np.zeros((m_count,), bool)
    for m in range(m_count):
        tris_m = scene_tris[tri_offsets[m]:tri_offsets[m] + tri_counts[m]]
        if len(tris_m):
            watertight[m] = _mesh_watertight(scene_verts, tris_m,
                                             canon=canon_ids)

    inner_gap = np.full((m_count,), 3.0e30, np.float32)
    for m in range(m_count):
        sel = mesh_id == m
        if not sel.any() or not watertight[m]:
            continue
        c = bounds[m, :3]
        a = np.stack([soup[f"v1{ax}"][sel] for ax in "xyz"], 1) - c
        b = a + np.stack([soup[f"e1{ax}"][sel] for ax in "xyz"], 1)
        cc = a + np.stack([soup[f"e2{ax}"][sel] for ax in "xyz"], 1)
        # van Oosterom-Strackee signed solid angle per triangle.
        la = np.linalg.norm(a, axis=1)
        lb = np.linalg.norm(b, axis=1)
        lc = np.linalg.norm(cc, axis=1)
        num = np.einsum("ij,ij->i", a, np.cross(b, cc))
        den = (la * lb * lc + np.einsum("ij,ij->i", a, b) * lc
               + np.einsum("ij,ij->i", a, cc) * lb
               + np.einsum("ij,ij->i", b, cc) * la)
        omega = 2.0 * np.arctan2(num, den)
        # Degenerate triangles (e.g. the tessellation's pole slivers)
        # subtend nothing but can hit the atan2(0, -x) = pi branch.
        area2 = np.linalg.norm(np.cross(b - a, cc - a), axis=1)
        omega = np.where(area2 > 1e-12, omega, 0.0)
        if abs(abs(float(omega.sum())) - 4.0 * np.pi) > 1e-2:
            continue  # not closed around the center
        n_geo = np.cross(b - a, cc - a)
        ln = np.linalg.norm(n_geo, axis=1)
        # Exclude slivers (relative area cutoff): their plane normals are
        # numerical noise. A crossing that lands exactly on such a sliver
        # (or in a Möller-Trumbore epsilon crack between faces) diverges
        # from the per-triangle sweep at isolated pixels — the same class
        # of boundary divergence the statistical parity gates budget for.
        ok = ln > 1e-6 * float(ln.max())
        if not ok.any():
            continue
        plane_d = np.abs(np.einsum("ij,ij->i", n_geo[ok], a[ok])) / ln[ok]
        r_in = float(plane_d.min())
        if r_in > 0.0:
            inner_gap[m] = bounds[m, 3] - r_in * r_in

    # Interior certain-hit balls for meshes the central inscribed sphere
    # serves poorly (e.g. tori, whose bound center sits in the hole).
    # Meshes with a strong central sphere (r_in >= 0.5 r_out — tessellated
    # spheres have r_in ~ r_out) skip ball construction, so sphere scenes
    # pay zero extra unrolled kernel work (dead balls are dropped at trace
    # time, build_triangle_call).
    balls = np.full((m_count, _BALLS, 4), -1.0, np.float32)
    for m in range(m_count):
        if inner_gap[m] < 2e30 and \
                bounds[m, 3] - inner_gap[m] >= 0.25 * bounds[m, 3]:
            continue
        sel = np.flatnonzero(mesh_id == m)
        if len(sel) == 0:
            continue
        if not watertight[m]:
            continue  # balls unsound through cracks; walk stays exact
        v1 = np.stack([soup[f"v1{a}"][sel] for a in "xyz"], 1).astype(
            np.float64)
        v2 = v1 + np.stack([soup[f"e1{a}"][sel] for a in "xyz"], 1)
        v3 = v1 + np.stack([soup[f"e2{a}"][sel] for a in "xyz"], 1)
        live = sub_bounds[m, :, :, 3].reshape(-1) > 0
        sub_c = sub_bounds[m].reshape(-1, 5)[live, :3].astype(np.float64)
        sub_r = sub_bounds[m].reshape(-1, 5)[live, 4].astype(np.float64)
        balls[m] = _interior_balls(v1, v2, v3, sub_c, sub_r)

    # Sphere-normal detection (see docstring): per corner k of every
    # triangle, normal_k == (vertex_k - center_m) / r_m within tolerance.
    sphere_normals = True
    na = np.stack([soup[f"na{a}"] for a in "xyz"], 1)
    nb = na + np.stack([soup[f"dnb{a}"] for a in "xyz"], 1)
    nc = na + np.stack([soup[f"dnc{a}"] for a in "xyz"], 1)
    v1s = np.stack([soup[f"v1{a}"] for a in "xyz"], 1)
    v2s = v1s + np.stack([soup[f"e1{a}"] for a in "xyz"], 1)
    v3s = v1s + np.stack([soup[f"e2{a}"] for a in "xyz"], 1)
    for m in range(m_count):
        sel = mesh_id == m
        c = bounds[m, :3]
        rs = np.sqrt(((v1s[sel] - c) ** 2).sum(1))
        r = float(rs.mean()) if rs.size else 0.0
        if r <= 0.0 or float(np.abs(rs - r).max()) > 1e-3 * r:
            sphere_normals = False
            break
        for v, nrm in ((v1s, na), (v2s, nb), (v3s, nc)):
            if float(np.abs((v[sel] - c) / r - nrm[sel]).max()) > 1e-4:
                sphere_normals = False
                break
        if not sphere_normals:
            break
    if cache_path is not None:
        try:
            _os.makedirs(_os.path.dirname(cache_path), exist_ok=True)
            import tempfile
            fd, tmp = tempfile.mkstemp(dir=_os.path.dirname(cache_path))
            with _os.fdopen(fd, "wb") as fh:
                np.savez(fh, blocks=blocks, bounds=bounds, slab=slab_bounds,
                         sub=sub_bounds, scnt=slab_count, gap=inner_gap,
                         sphn=np.bool_(sphere_normals), balls=balls)
            _os.replace(tmp, cache_path)
        except OSError:
            pass
    return (blocks, bounds, slab_bounds, sub_bounds, slab_count, inner_gap,
            sphere_normals, balls)


def pack_slab_groups(slab_np: np.ndarray, scount_np: np.ndarray,
                     gsub: int) -> tuple[np.ndarray, np.ndarray]:
    """Bounding spheres over runs of `gsub` consecutive slabs (the second
    acceleration level for huge meshes — slabs are spatially sorted, so
    consecutive runs are spatially compact, same argument as the slabs
    themselves). Returns (group_bounds (M, G, 5) [cx cy cz r^2 r],
    group_count (M,) i32); empty groups get r^2 = -1e30 (never entered).
    Conservative by construction: group radius = max over member slabs of
    |slab_center - group_center| + slab_radius."""
    m_count, n_slabs, _ = slab_np.shape
    g_max = max(1, -(-n_slabs // gsub))
    out = np.zeros((m_count, g_max, 5), np.float32)
    out[:, :, 3] = -1e30
    gcnt = np.zeros((m_count,), np.int32)
    for m in range(m_count):
        sc = int(scount_np[m])
        gcnt[m] = -(-sc // gsub) if sc else 0
        for g in range(int(gcnt[m])):
            sl = slab_np[m, g * gsub:min((g + 1) * gsub, sc)]
            live = sl[:, 3] > 0.0
            if not live.any():
                continue
            c, r = sl[live, :3], sl[live, 4]
            lo = (c - r[:, None]).min(0)
            hi = (c + r[:, None]).max(0)
            gc = 0.5 * (lo + hi)
            gr = float((np.sqrt(((c - gc) ** 2).sum(1)) + r).max())
            gr *= 1.0 + 1e-5
            out[m, g] = [*gc, gr * gr, gr]
    return out, gcnt


def _sweep_mesh(blk, m, carry, ox, oy, oz, dx, dy, dz, start, count,
                want_texcoords):
    """Möller-Trumbore over one SMEM-resident mesh block, tracking the
    running best hit with candidate-time attribute interpolation.
    Texcoords are only interpolated when an AOV needs them."""
    f32 = jnp.float32
    big = f32(3.0e38)
    eps = f32(1e-6)

    def tri(t, carry):
        (bt, bu, bv, bnx, bny, bnz, btu, btv, bmesh) = carry
        v1x, v1y, v1z = blk[_V1, t], blk[_V1 + 1, t], blk[_V1 + 2, t]
        e1x, e1y, e1z = blk[_E1, t], blk[_E1 + 1, t], blk[_E1 + 2, t]
        e2x, e2y, e2z = blk[_E2, t], blk[_E2 + 1, t], blk[_E2 + 2, t]
        # P = cross(dir, e2); det = dot(e1, P) (glsl:123-124)
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        det_ok = jnp.abs(det) >= eps
        rcp = f32(1.0) / jnp.where(det_ok, det, f32(1.0))
        tx, ty, tz = ox - v1x, oy - v1y, oz - v1z
        u = (tx * px + ty * py + tz * pz) * rcp
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * rcp
        th = (e2x * qx + e2y * qy + e2z * qz) * rcp
        valid = (det_ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                 & (u + v <= 1.0) & (th >= eps))
        th = jnp.where(valid, th, big)
        better = th < bt
        # Interpolated attributes (glsl:186-187) in affine form, unnormalized
        # like the reference: attr = base + u*db + v*dc.
        nx = blk[_NA, t] + u * blk[_DNB, t] + v * blk[_DNC, t]
        ny = blk[_NA + 1, t] + u * blk[_DNB + 1, t] + v * blk[_DNC + 1, t]
        nz = blk[_NA + 2, t] + u * blk[_DNB + 2, t] + v * blk[_DNC + 2, t]
        if want_texcoords:
            tu = blk[_TA, t] + u * blk[_DTB, t] + v * blk[_DTC, t]
            tv = blk[_TA + 1, t] + u * blk[_DTB + 1, t] + v * blk[_DTC + 1, t]
            btu = jnp.where(better, tu, btu)
            btv = jnp.where(better, tv, btv)
        return (jnp.where(better, th, bt), jnp.where(better, u, bu),
                jnp.where(better, v, bv), jnp.where(better, nx, bnx),
                jnp.where(better, ny, bny), jnp.where(better, nz, bnz),
                btu, btv,
                jnp.where(better, jnp.int32(m), bmesh))

    return _sweep_loop(tri, start, count, carry)


def _sweep_loop(tri, start, count, carry):
    """Static (cluster) bounds: FULLY UNROLL — a rolled Mosaic fori_loop
    pays per-iteration loop overhead comparable to the ~35-op body itself,
    and unrolling lets the independent per-triangle candidates pipeline
    (the same lesson as the sphere sweep and the Mandelbrot chain).
    Dynamic bounds (the cone-culled primary's visible count) keep the
    loop."""
    if isinstance(start, int) and isinstance(count, int):
        for t in range(start, start + count):
            carry = tri(t, carry)
        return carry
    return jax.lax.fori_loop(start, start + count, tri, carry)


def _sweep_mesh_fast(blk, m, carry, ox, oy, oz, dx, dy, dz, start, count):
    """Möller-Trumbore sweep tracking ONLY (best_t, best_mesh) — for scenes
    with sphere-exact vertex normals (pack_mesh_blocks), where the shading
    normal is recovered per ray as (hit_point - center)/r instead of being
    interpolated per candidate. 9 scalar loads per triangle instead of 18
    (the sweep is SMEM-fetch bound) and 2 running selects instead of 9."""
    f32 = jnp.float32
    big = f32(3.0e38)
    eps = f32(1e-6)

    def tri(t, carry):
        bt, bmesh = carry
        v1x, v1y, v1z = blk[_V1, t], blk[_V1 + 1, t], blk[_V1 + 2, t]
        e1x, e1y, e1z = blk[_E1, t], blk[_E1 + 1, t], blk[_E1 + 2, t]
        e2x, e2y, e2z = blk[_E2, t], blk[_E2 + 1, t], blk[_E2 + 2, t]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        det_ok = jnp.abs(det) >= eps
        rcp = f32(1.0) / jnp.where(det_ok, det, f32(1.0))
        tx, ty, tz = ox - v1x, oy - v1y, oz - v1z
        u = (tx * px + ty * py + tz * pz) * rcp
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * rcp
        th = (e2x * qx + e2y * qy + e2z * qz) * rcp
        valid = (det_ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                 & (u + v <= 1.0) & (th >= eps))
        th = jnp.where(valid, th, big)
        better = th < bt
        return (jnp.where(better, th, bt),
                jnp.where(better, jnp.int32(m), bmesh))

    return _sweep_loop(tri, start, count, carry)


def _anyhit_mesh(blk, any_hit, ox, oy, oz, dx, dy, dz, start, count):
    """Boolean Möller-Trumbore sweep: does the ray hit ANY triangle of the
    SMEM-resident mesh block? No winner tracking, no interpolation."""
    f32 = jnp.float32
    eps = f32(1e-6)

    def tri(t, any_hit):
        v1x, v1y, v1z = blk[_V1, t], blk[_V1 + 1, t], blk[_V1 + 2, t]
        e1x, e1y, e1z = blk[_E1, t], blk[_E1 + 1, t], blk[_E1 + 2, t]
        e2x, e2y, e2z = blk[_E2, t], blk[_E2 + 1, t], blk[_E2 + 2, t]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        det_ok = jnp.abs(det) >= eps
        rcp = f32(1.0) / jnp.where(det_ok, det, f32(1.0))
        tx, ty, tz = ox - v1x, oy - v1y, oz - v1z
        u = (tx * px + ty * py + tz * pz) * rcp
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * rcp
        th = (e2x * qx + e2y * qy + e2z * qz) * rcp
        valid = (det_ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                 & (u + v <= 1.0) & (th >= eps))
        return any_hit | valid.astype(jnp.int32)

    return _sweep_loop(tri, start, count, any_hit)


def _bound_enter(ox, oy, oz, dx, dy, dz, cx, cy, cz, r2):
    """Sqrt-free conservative tests against a bounding sphere. Returns
    (enter, hb, c): `enter` is True iff the ray meets the bound with some
    t >= 0 (origin inside, or bound ahead with a real root).

    The discriminant test is written `hb*hb - c >= 0` (NOT `hb*hb >= c`) so
    dead lanes parked at 3e30 (pathtrace.py) overflow to inf - inf = NaN and
    compare false — otherwise inf >= inf is TRUE and dead lanes vote to
    sweep meshes nobody will merge."""
    rox, roy, roz = ox - cx, oy - cy, oz - cz
    hb = rox * dx + roy * dy + roz * dz
    c = rox * rox + roy * roy + roz * roz - r2
    enter = (c < 0.0) | ((hb < 0.0) & (hb * hb - c >= 0.0))
    return enter, hb, c


def _kernel(cfg, mesh_count, tpad, fast, shellwalk_cfg, items, mesh_balls,
            groups_cfg, walk_primaries, lights, *refs):
    if not cfg.rng_stateful:
        (sched_ref, vis_ref, cam_ref, order_ref, bcx_ref, bcy_ref, bcz_ref,
         br2_ref, brad_ref, slb_ref, sub_ref, scnt_ref, grp_ref, gcnt_ref,
         gap_ref, balls_ref,
         tcx_ref, tcy_ref, tcz_ref, tr_ref, blocks_hbm, accum_in, _out_in,
         accum_out, out_out, smem_blk, dma_sem, best_f, best_i,
         flags_vmem, flags_ref, wlist_ref, gwlist_ref) = refs
        rng_in = rng_out = None
    else:
        (sched_ref, vis_ref, cam_ref, order_ref, bcx_ref, bcy_ref, bcz_ref,
         br2_ref, brad_ref, slb_ref, sub_ref, scnt_ref, grp_ref, gcnt_ref,
         gap_ref, balls_ref,
         tcx_ref, tcy_ref, tcz_ref, tr_ref, blocks_hbm, accum_in, _out_in,
         rng_in, accum_out, out_out, rng_out, smem_blk, dma_sem, best_f,
         best_i, flags_vmem, flags_ref, wlist_ref, gwlist_ref) = refs

    f32 = jnp.float32
    big = f32(3.0e38)
    i = pl.program_id(0)
    tile_x = sched_ref[i, 0]
    tile_y = sched_ref[i, 1]
    tid = tile_y * jnp.int32(cfg.tile_count_x) + tile_x
    # Slab-sharding extras (zero on a single chip; see camera.py layout and
    # the identical lines in sphere_pt._kernel): row_offset globalizes the
    # framebuffer row for ray-gen + RNG keying on a tile-axis shard; stream
    # decorrelates sample-axis replicas. (Before r3 the triangle kernel
    # ignored both — every tile shard rendered the TOP slab and every
    # sample replica drew identical samples; masked by a sharded test that
    # compared all-black images, see tests/test_parallel.py.)
    row_offset = cam_ref[ROW_PROJ, 2].astype(jnp.int32)
    stream = cam_ref[ROW_PROJ, 3].astype(jnp.int32).astype(jnp.uint32)
    row, col = tile_pixel_coords(cfg, tile_x, tile_y)
    row = row + row_offset  # global framebuffer row
    pixel_index = (col + row * jnp.int32(cfg.padded_width)).astype(jnp.uint32)
    # Scalar: counts are tile-uniform (see sphere_pt), and tpu_hw seeds on it.
    sample_index = accum_in[3, 0, 0].astype(jnp.int32).astype(jnp.uint32)

    shape = (cfg.tile_height, cfg.tile_width)
    want_tc = cfg.aov in ("tex_coords",)
    zero = jnp.zeros(shape, f32)

    def _slab_copy(m, s, p):
        """Copy descriptor for (mesh m, slab s) into staging buffer p.
        One (24, 128) lane-aligned slab copy (VMEM-resident blocks ->
        SMEM staging; a strided attribute sub-slice DMA measured slower
        than moving the few extra rows)."""
        return pltpu.make_async_copy(
            blocks_hbm.at[m, :, pl.ds(s * _SLAB, _SLAB)],
            smem_blk.at[p], dma_sem.at[p])

    def dma_slab(m, s):
        # Synchronous staging into buffer 0 (the cone-culled primary
        # path; the work-list walks pipeline through _walk_items instead).
        if _ablate_mode() == "nodma":
            # Timing probe only (results are garbage: sweeps read stale
            # SMEM): measures the copies' share of the walk (r4: 3.0 vs
            # 15.5 ms/frame-spp => ~80%, which is what motivated the
            # double-buffered walk).
            return
        cp = _slab_copy(m, s, 0)
        cp.start()
        cp.wait()

    def init_best():
        best_f[0] = jnp.full(shape, big, f32)
        if not fast:
            for p in range(1, 8):
                best_f[p] = zero
        best_i[0] = jnp.full(shape, -1, jnp.int32)

    def read_best():
        if fast:
            return (best_f[0], best_i[0])
        return (best_f[0], best_f[1], best_f[2], best_f[3], best_f[4],
                best_f[5], best_f[6], best_f[7], best_i[0])

    def write_best(carry):
        if fast:
            best_f[0] = carry[0]
            best_i[0] = carry[1]
            return
        for p in range(8):
            best_f[p] = carry[p]
        best_i[0] = carry[8]

    # (mesh, slab) work items: q = m * SPP + s with SPP the next power of
    # two of the slab count (scalar decode is two shift/mask ops).
    n_slabs = tpad // _SLAB
    spp = 1 << (n_slabs - 1).bit_length()
    sp_log = spp.bit_length() - 1

    # Slab/sub bound tables arrive FLATTENED to 1-D: an SMEM window pads
    # its minor dimension to 128, so the natural (M, S, 8, 5) layout
    # inflates 25x (1.0 MB for the reference scene — over the 1 MB SMEM
    # budget). Flat arrays stay at their raw byte size.
    def _slb(m, s, k):
        return slb_ref[(m * n_slabs + s) * 5 + k]

    def _sub(m, s, c, k):
        return sub_ref[((m * n_slabs + s) * _SUBS + c) * 5 + k]

    def _masked_slab(m, s, cond_fn, sub_sweep, ox, oy, oz, dx, dy, dz,
                     blk=None):
        # Gated slab visit: the _SUBS sub-cluster "needed" bits are
        # reduced in one pass into a single scalar mask; the slab DMA and
        # the 16-tri sweeps only run for set bits. (A per-sub
        # jnp.any/pl.when chain paid a scalar sync per sub-cluster plus an
        # unconditional slab DMA per entered slab — the measured dominant
        # cost of the torus-field bounce walks.)
        #
        # `blk` non-None means the slab was already PREFETCHED there by the
        # double-buffered walk (_walk_items) — no copy here; None keeps
        # the synchronous buffer-0 staging (primary path).
        mask = jnp.int32(0)
        for c in range(_SUBS):
            entc, hbc, _ = _bound_enter(
                ox, oy, oz, dx, dy, dz, _sub(m, s, c, 0),
                _sub(m, s, c, 1), _sub(m, s, c, 2),
                _sub(m, s, c, 3))
            lowc = jnp.maximum(-hbc - _sub(m, s, c, 4), jnp.float32(0.0))
            bit = jnp.max((cond_fn(entc, lowc)).astype(jnp.int32) << c)
            mask = mask | bit

        @pl.when(mask != 0)
        def _do():
            if blk is None:
                dma_slab(m, s)
            b = smem_blk.at[0] if blk is None else blk
            for c in range(_SUBS):
                @pl.when((mask >> c) & 1 != 0)
                def _one(c=c):
                    sub_sweep(c, b)

    def sweep_slab(m, s, ox, oy, oz, dx, dy, dz, blk=None):
        def sub_sweep(c, b):
            if fast:
                write_best(_sweep_mesh_fast(
                    b, m, read_best(), ox, oy, oz, dx, dy, dz,
                    c * _SUBSIZE, _SUBSIZE))
            else:
                write_best(_sweep_mesh(
                    b, m, read_best(), ox, oy, oz, dx, dy, dz,
                    c * _SUBSIZE, _SUBSIZE, want_tc))

        _masked_slab(m, s, lambda entc, lowc: entc & (lowc < best_f[0]),
                     sub_sweep, ox, oy, oz, dx, dy, dz, blk=blk)

    def pick_bound_r2(bmesh):
        # Winner's bound r^2 (cone-NEE MIS input) via one scalar mesh pass.
        def pick(m, b2):
            return jnp.where(bmesh == m, br2_ref[m], b2)
        return jax.lax.fori_loop(0, mesh_count, pick, jnp.ones(shape, f32))

    def finish(ox, oy, oz, dx, dy, dz) -> Hit:
        # bmesh >= 0 guards against lanes whose inscribed-sphere seed
        # (see intersect) promised a hit that the epsilon-cracked triangle
        # sweep then failed to deliver — the same isolated-boundary class
        # the any-hit certain-hit shortcut budgets for.
        if fast:
            bt, bmesh = read_best()
            hit = (bt < big) & (bmesh >= 0)
            bt = jnp.where(hit, bt, f32(-1.0))
            # Recover the winner's center/radius with one scalar pass over
            # the meshes (6 vector ops each) instead of carrying them
            # through every triangle candidate.
            cx = zero
            cy = zero
            cz = zero
            rr = zero
            b2 = jnp.ones(shape, f32)

            def pick(m, carry):
                cx, cy, cz, rr, b2 = carry
                is_m = bmesh == m
                return (jnp.where(is_m, bcx_ref[m], cx),
                        jnp.where(is_m, bcy_ref[m], cy),
                        jnp.where(is_m, bcz_ref[m], cz),
                        jnp.where(is_m, f32(1.0) / brad_ref[m], rr),
                        jnp.where(is_m, br2_ref[m], b2))

            cx, cy, cz, rr, b2 = jax.lax.fori_loop(
                0, mesh_count, pick, (cx, cy, cz, rr, b2))
            # Shading normal == the reference's interpolated vertex normal,
            # by linearity (pack_mesh_blocks docstring): (p - c)/r.
            hx = ox + bt * dx
            hy = oy + bt * dy
            hz = oz + bt * dz
            return Hit(t=bt, px=hx, py=hy, pz=hz,
                       nx=(hx - cx) * rr, ny=(hy - cy) * rr,
                       nz=(hz - cz) * rr, index=bmesh,
                       emis_r2=jnp.ones(shape, f32),  # glsl:268
                       tc_u=zero, tc_v=zero, b_u=zero, b_v=zero,
                       bound_r2=b2)
        bt, bu, bv, nx, ny, nz, tu, tv, bmesh = read_best()
        hit = (bt < big) & (bmesh >= 0)
        bt = jnp.where(hit, bt, f32(-1.0))
        return Hit(t=bt, px=zero, py=zero, pz=zero,
                   nx=nx, ny=ny, nz=nz, index=bmesh,
                   emis_r2=jnp.ones(shape, f32),  # glsl:268: sqrRadius = 1
                   tc_u=tu, tc_v=tv, b_u=bu, b_v=bv,
                   bound_r2=pick_bound_r2(bmesh))

    def _slab_bound(m, s, ox, oy, oz, dx, dy, dz):
        enter, hb, _c = _bound_enter(
            ox, oy, oz, dx, dy, dz, _slb(m, s, 0), _slb(m, s, 1),
            _slb(m, s, 2), _slb(m, s, 3))
        lower = jnp.maximum(-hb - _slb(m, s, 4), jnp.float32(0.0))
        return enter, lower

    def intersect_primary(ox, oy, oz, dx, dy, dz) -> Hit:
        # Cone-culled: the host table lists the meshes whose bounds meet
        # this tile's view cone, in tile-id order (see sphere_pt's
        # full_visibility_table — same machinery over mesh bounds). Each
        # visible mesh's slabs are gated individually (a tile cone can
        # meet a mesh bound yet miss most of a large mesh's slabs).
        init_best()
        n_vis = vis_ref[tid, 0]

        def per_vis(j, _):
            m = vis_ref[tid, 1 + j]

            def per_slab(s, _):
                sweep_slab(m, s, ox, oy, oz, dx, dy, dz)
                return _

            jax.lax.fori_loop(0, scnt_ref[m], per_slab, jnp.int32(0))
            return _

        jax.lax.fori_loop(0, n_vis, per_vis, jnp.int32(0))
        return finish(ox, oy, oz, dx, dy, dz)

    # ---- Work-list machinery for the bounce walks --------------------------
    # The r2-midpoint kernel walked ALL mesh_count bounds in a rolled
    # fori_loop whose per-mesh body did a vector->scalar `jnp.any` + a
    # `pl.when` — measured as the dominant cost of the whole kernel (the
    # walks, not the triangle sweeps). Here each walk becomes:
    #   1. one UNROLLED branch-free pass over all (mesh, slab) items
    #      (static ids, vector-only: no reductions, no branches) that
    #      computes per-item need flags as 0/1 LANES of a flag row;
    #   2. one on-chip copy of the flag row to SMEM;
    #   3. a cheap SCALAR loop compacting flagged item ids (front-to-back
    #      in mesh order, slab-ordered within a mesh) into wlist;
    #   4. a rolled loop over just the surviving items that does the
    #      slab DMA + sub-cluster-gated triangle sweeps.
    flag_rows = (mesh_count * spp + 127) // 128
    lane_of = jax.lax.broadcasted_iota(jnp.int32, (flag_rows, 128), 1)
    row_of = jax.lax.broadcasted_iota(jnp.int32, (flag_rows, 128), 0)

    def _flag_put(frow, q, cond):
        # any(cond) as a (1,1) vector value (no scalar sync), placed into
        # flag lane q (static item id m * spp + s).
        bit = jnp.max(cond.astype(jnp.int32), keepdims=True)
        sel = (row_of == q // 128) & (lane_of == q % 128)
        return jnp.where(sel, bit, frow)

    def _compact(frow):
        # Flag row -> SMEM, then a scalar pass appends flagged item ids in
        # front-to-back mesh order. Branch-free append: write always,
        # advance the cursor by the flag.
        flags_vmem[...] = frow
        cp = pltpu.make_async_copy(flags_vmem, flags_ref, dma_sem.at[0])
        cp.start()
        cp.wait()

        def outer(j, k):
            m = order_ref[j]

            def inner(s, k):
                q = m * spp + s
                wlist_ref[k] = q
                return k + flags_ref[q // 128, q % 128]

            return jax.lax.fori_loop(0, scnt_ref[m], inner, k)

        return jax.lax.fori_loop(0, mesh_count, outer, jnp.int32(0))

    def _mesh_bound(m, ox, oy, oz, dx, dy, dz):
        return _bound_enter(ox, oy, oz, dx, dy, dz, bcx_ref[m],
                            bcy_ref[m], bcz_ref[m], br2_ref[m])

    def _flag_items_flat(cond_fn, ox, oy, oz, dx, dy, dz):
        # Unrolled vector flag pass over the static non-empty items.
        frow = jnp.zeros((flag_rows, 128), jnp.int32)
        for m, s in items:
            enter, lower = _slab_bound(m, s, ox, oy, oz, dx, dy, dz)
            frow = _flag_put(frow, m * spp + s, cond_fn(enter, lower))
        return _compact(frow)

    if groups_cfg is None:
        _flag_items = _flag_items_flat
    else:
        # Hierarchical flag pass (huge work lists — see _HIER_MIN): the
        # UNROLLED branch-free pass runs over the ~S/_GROUP slab-GROUP
        # bounds only; surviving groups are compacted (same flag-row ->
        # SMEM -> scalar-append machinery) and a ROLLED pass tests just
        # their member slabs. Front-to-back ordering is preserved: groups
        # append in mesh order / ascending g, slabs scan the group list in
        # that order / ascending s. cond_fn at the group level is
        # conservative (the group sphere contains its member slabs' — a
        # group's `lower` is a valid lower bound for every member).
        g_items, gpp, g_stride, gsub = groups_cfg
        gp_log = gpp.bit_length() - 1

        def _grp(m, g, kk):
            return grp_ref[(m * g_stride + g) * 5 + kk]

        def _group_bound(m, g, ox, oy, oz, dx, dy, dz):
            enter, hb, _c = _bound_enter(
                ox, oy, oz, dx, dy, dz, _grp(m, g, 0), _grp(m, g, 1),
                _grp(m, g, 2), _grp(m, g, 3))
            lower = jnp.maximum(-hb - _grp(m, g, 4), jnp.float32(0.0))
            return enter, lower

        def _compact_groups(frow):
            flags_vmem[...] = frow
            cp = pltpu.make_async_copy(flags_vmem, flags_ref, dma_sem.at[0])
            cp.start()
            cp.wait()

            def outer(j, kk):
                m = order_ref[j]

                def inner(g, kk):
                    q = m * gpp + g
                    gwlist_ref[kk] = q
                    return kk + flags_ref[q // 128, q % 128]

                return jax.lax.fori_loop(0, gcnt_ref[m], inner, kk)

            return jax.lax.fori_loop(0, mesh_count, outer, jnp.int32(0))

        def _flag_items(cond_fn, ox, oy, oz, dx, dy, dz):
            frow = jnp.zeros((flag_rows, 128), jnp.int32)
            for m, g in g_items:
                enter, lower = _group_bound(m, g, ox, oy, oz, dx, dy, dz)
                frow = _flag_put(frow, m * gpp + g, cond_fn(enter, lower))
            n_groups = _compact_groups(frow)

            def slab_flags(j, frow):
                q = gwlist_ref[j]
                m, g = q >> gp_log, q & (gpp - 1)
                for t in range(gsub):
                    s = g * gsub + t
                    live = s < scnt_ref[m]
                    enter, lower = _slab_bound(m, s, ox, oy, oz, dx, dy, dz)
                    frow = _flag_put(frow, m * spp + s,
                                     cond_fn(enter, lower) & live)
                return frow

            frow_s = jax.lax.fori_loop(
                0, n_groups, slab_flags,
                jnp.zeros((flag_rows, 128), jnp.int32))
            flags_vmem[...] = frow_s
            cp = pltpu.make_async_copy(flags_vmem, flags_ref, dma_sem.at[0])
            cp.start()
            cp.wait()

            def outer(j, kk):
                q = gwlist_ref[j]
                m, g = q >> gp_log, q & (gpp - 1)

                def inner(t, kk):
                    qs = m * spp + g * gsub + t
                    wlist_ref[kk] = qs
                    return kk + flags_ref[qs // 128, qs % 128]

                return jax.lax.fori_loop(0, gsub, inner, kk)

            return jax.lax.fori_loop(0, n_groups, outer, jnp.int32(0))

    def _walk_items(n_work, visit_fn):
        # Rolled DOUBLE-BUFFERED walk over the compacted items: the slab
        # copy for item j+1 is issued before item j's sweeps run, hiding
        # the VMEM->SMEM latency that the r4 nodma ablation measured at
        # ~80% of the whole walk (3.0 vs 15.5 ms/frame-spp). Copies are
        # unconditional by work-list order — the flag pass already
        # filtered to plausible items. Measured +7% on the torus field
        # (13.6 -> 12.6 ms/frame-spp) — less than the copy share
        # suggests, because the synchronous path's mask-gated copy skips
        # items the live best has fully pruned while the prefetcher pays
        # every flagged item; the net is still a win (PROFILE.md r4 walk
        # ablations). visit_fn(m, s, blk) re-checks per-lane liveness
        # inside its own masked gate (the static flags only saw the seed;
        # earlier sweeps tighten the live best).
        if _ablate_mode() == "nodma":
            def per_item(j, _):
                q = wlist_ref[j]
                visit_fn(q >> sp_log, q & (spp - 1), smem_blk.at[0])
                return _

            jax.lax.fori_loop(0, n_work, per_item, jnp.int32(0))
            return

        if not _DOUBLE_BUF:
            # Synchronous variant (L2N_TRI_DB=0): blk=None routes each
            # visit through _masked_slab's mask-GATED buffer-0 copy —
            # items whose every sub-cluster is already pruned by the live
            # best skip their DMA entirely, at the price of exposed copy
            # latency on the items that do sweep.
            def per_item_sync(j, _):
                q = wlist_ref[j]
                visit_fn(q >> sp_log, q & (spp - 1), None)
                return _

            jax.lax.fori_loop(0, n_work, per_item_sync, jnp.int32(0))
            return

        def start_copy(j, p):
            q = wlist_ref[j]
            _slab_copy(q >> sp_log, q & (spp - 1), p).start()

        @pl.when(n_work > 0)
        def _prologue():
            start_copy(jnp.int32(0), jnp.int32(0))

        def per_item(j, _):
            p = j & 1
            q = wlist_ref[j]
            m, s = q >> sp_log, q & (spp - 1)
            _slab_copy(m, s, p).wait()

            @pl.when(j + 1 < n_work)
            def _next():
                start_copy(j + 1, 1 - p)

            visit_fn(m, s, smem_blk.at[p])
            return _

        jax.lax.fori_loop(0, n_work, per_item, jnp.int32(0))

    def anyhit_slab(m, s, lane_mask, ox, oy, oz, dx, dy, dz, blk=None):
        def sub_sweep(c, b):
            best_i[0] = _anyhit_mesh(
                b, best_i[0], ox, oy, oz, dx, dy, dz,
                c * _SUBSIZE, _SUBSIZE)

        _masked_slab(m, s,
                     lambda entc, lowc: lane_mask & entc & (best_i[0] == 0),
                     sub_sweep, ox, oy, oz, dx, dy, dz, blk=blk)

    def _pending_walk(pending, ox, oy, oz, dx, dy, dz):
        # Fallback slab-sweep walk for shellwalk's PENDING lanes (wide
        # chords, inscribed starts, slot overflow — measured well under
        # 0.1% of rays): flags only consider pending lanes, so the work
        # list is empty for almost every block.
        n_work = _flag_items(
            lambda enter, lower: pending & enter & (lower < best_f[0]),
            ox, oy, oz, dx, dy, dz)

        def visit(m, s, blk):
            def sub_sweep(c, b):
                if fast:
                    write_best(_sweep_mesh_fast(
                        b, m, read_best(), ox, oy, oz, dx, dy, dz,
                        c * _SUBSIZE, _SUBSIZE))
                else:
                    write_best(_sweep_mesh(
                        b, m, read_best(), ox, oy, oz, dx, dy, dz,
                        c * _SUBSIZE, _SUBSIZE, want_tc))

            _masked_slab(m, s,
                         lambda entc, lowc: pending & entc
                         & (lowc < best_f[0]),
                         sub_sweep, ox, oy, oz, dx, dy, dz, blk=blk)

        _walk_items(n_work, visit)

    def intersect_shell(ox, oy, oz, dx, dy, dz) -> Hit:
        # Procedural nearest-hit (shellwalk): per-lane candidate meshes
        # with recomputed geometry — no lockstep union, no SMEM sweeps
        # except for the rare pending lanes.
        from l2n_tpu.ops.kernels.shellwalk import BIG as SW_BIG
        from l2n_tpu.ops.kernels.shellwalk import shell_nearest
        disc_lat, disc_long, r_in_unit = shellwalk_cfg

        def fetch_cr(m):
            return tcx_ref[m], tcy_ref[m], tcz_ref[m], tr_ref[m]

        t, m_hit, pending = shell_nearest(
            disc_lat, disc_long, r_in_unit, mesh_count, fetch_cr,
            ox, oy, oz, dx, dy, dz)
        init_best()
        # Seed the scratch with shellwalk's results: exact for resolved
        # lanes; a valid upper bound for pending ones (the walk below can
        # only find nearer stored-geometry hits).
        best_f[0] = jnp.where(t >= 0.0, t, f32(SW_BIG))
        best_i[0] = m_hit
        _pending_walk(pending, ox, oy, oz, dx, dy, dz)
        return finish(ox, oy, oz, dx, dy, dz)

    def intersect_anyhit_shell(ox, oy, oz, dx, dy, dz):
        from l2n_tpu.ops.kernels.shellwalk import shell_nearest
        disc_lat, disc_long, r_in_unit = shellwalk_cfg

        def fetch_cr(m):
            return tcx_ref[m], tcy_ref[m], tcz_ref[m], tr_ref[m]

        t, _m, pending = shell_nearest(
            disc_lat, disc_long, r_in_unit, mesh_count, fetch_cr,
            ox, oy, oz, dx, dy, dz)
        hit = (t >= 0.0).astype(jnp.int32)
        best_i[0] = hit
        pend = pending & (hit == 0)
        n_work = _flag_items(lambda enter, lower: pend & enter,
                             ox, oy, oz, dx, dy, dz)
        _walk_items(n_work,
                    lambda m, s, blk: anyhit_slab(m, s, pend,
                                                  ox, oy, oz, dx, dy, dz,
                                                  blk=blk))
        return best_i[0] != 0

    def intersect(ox, oy, oz, dx, dy, dz) -> Hit:
        # Bounce nearest-hit. Pass 1 also computes a per-lane UPPER BOUND
        # on the nearest surface hit from the inscribed spheres of closed
        # meshes (pack_mesh_blocks): a ray crossing mesh m's inner sphere
        # must hit m's surface no later than the inner-sphere entry (and a
        # ray STARTING inside it no later than the outer-sphere exit).
        # Seeding best_t with an inflated copy of that bound prunes
        # mesh- and cluster-level gates from the start; inflation keeps
        # every real hit strictly below the seed, so the sweep result is
        # unchanged (modulo the epsilon-crack caveat shared with the
        # any-hit certain-hit shortcut).
        init_best()
        big_ = f32(3.0e38)
        t_ub = jnp.full(shape, big_, f32)
        for m in range(mesh_count):
            _enter, hb, c = _mesh_bound(m, ox, oy, oz, dx, dy, dz)
            c_in = c + gap_ref[m]
            disc_in = hb * hb - c_in
            crossing = (hb < 0.0) & (disc_in >= 0.0) & (c_in >= 0.0)
            t_in = -hb - jnp.sqrt(jnp.maximum(disc_in, f32(0.0)))
            t_exit = -hb + jnp.sqrt(jnp.maximum(hb * hb - c, f32(0.0)))
            ub = jnp.where(crossing, t_in,
                           jnp.where(c_in < 0.0, t_exit, big_))
            t_ub = jnp.minimum(t_ub, ub)
            # Interior certain-hit balls (meshes the central inscribed
            # sphere serves poorly, e.g. tori — see _interior_balls): a
            # ray crossing a ball strictly inside the closed solid hits
            # the surface no later than ball entry; an origin inside a
            # ball (fp-crack corner) is bounded by the OUTER bound's exit
            # (it is inside the solid, mirroring the c_in < 0 case above).
            for kb in mesh_balls[m]:
                base = (m * _BALLS + kb) * 4
                rbx = ox - balls_ref[base]
                rby = oy - balls_ref[base + 1]
                rbz = oz - balls_ref[base + 2]
                hb_b = rbx * dx + rby * dy + rbz * dz
                c_b = (rbx * rbx + rby * rby + rbz * rbz
                       - balls_ref[base + 3])
                disc_b = hb_b * hb_b - c_b  # NaN for parked lanes -> False
                cross_b = (hb_b < 0.0) & (disc_b >= 0.0) & (c_b >= 0.0)
                t_in_b = -hb_b - jnp.sqrt(jnp.maximum(disc_b, f32(0.0)))
                ub = jnp.where(cross_b, t_in_b,
                               jnp.where(c_b < 0.0, t_exit, big_))
                t_ub = jnp.minimum(t_ub, ub)
        seed = t_ub * f32(1.0 + 4e-6) + f32(1e-5)
        best_f[0] = seed

        _ab = _ablate_mode()
        if _ab == "noflags":   # walk every item (flag-pass cost probe)
            def fill(j, k):
                m = order_ref[j]

                def inner(s, k):
                    wlist_ref[k] = m * spp + s
                    return k + 1

                return jax.lax.fori_loop(0, scnt_ref[m], inner, k)

            n_work = jax.lax.fori_loop(0, mesh_count, fill, jnp.int32(0))
        else:
            n_work = _flag_items(
                lambda enter, lower: enter & (lower < seed),
                ox, oy, oz, dx, dy, dz)
        if _ab != "nowalk":
            # Each visit re-checks against the LIVE best: earlier sweeps
            # in the front-to-back order tighten it below the static seed.
            _walk_items(n_work,
                        lambda m, s, blk: sweep_slab(m, s, ox, oy, oz,
                                                     dx, dy, dz, blk=blk))
        return finish(ox, oy, oz, dx, dy, dz)

    def intersect_anyhit(ox, oy, oz, dx, dy, dz):
        # Boolean sweep for the last segment (env test only). Reuses the
        # best_i scratch plane as the per-lane hit accumulator. Pass 1
        # resolves all certain hits (inscribed-sphere crossings of closed
        # meshes) branch-free; only grazing-band rays reach triangle tests.
        acc = jnp.zeros(shape, jnp.int32)
        for m in range(mesh_count):
            _enter, hb, c = _mesh_bound(m, ox, oy, oz, dx, dy, dz)
            c_in = c + gap_ref[m]
            cross = (c_in < 0.0) | ((hb < 0.0) & (hb * hb - c_in >= 0.0))
            acc = acc | cross.astype(jnp.int32)
            # Interior balls: crossing (or starting inside) any ball
            # strictly inside the closed solid certifies a surface hit —
            # the torus analog of the inscribed-sphere shortcut above.
            for kb in mesh_balls[m]:
                base = (m * _BALLS + kb) * 4
                rbx = ox - balls_ref[base]
                rby = oy - balls_ref[base + 1]
                rbz = oz - balls_ref[base + 2]
                hb_b = rbx * dx + rby * dy + rbz * dz
                c_b = (rbx * rbx + rby * rby + rbz * rbz
                       - balls_ref[base + 3])
                cross_b = (c_b < 0.0) | ((hb_b < 0.0)
                                         & (hb_b * hb_b - c_b >= 0.0))
                acc = acc | cross_b.astype(jnp.int32)
        best_i[0] = acc
        uncertain = acc == 0
        n_work = _flag_items(lambda enter, lower: uncertain & enter,
                             ox, oy, oz, dx, dy, dz)
        _walk_items(n_work,
                    lambda m, s, blk: anyhit_slab(m, s, True,
                                                  ox, oy, oz, dx, dy, dz,
                                                  blk=blk))
        return best_i[0] != 0

    if shellwalk_cfg is not None:
        intersect = intersect_shell
        intersect_anyhit = intersect_anyhit_shell
    elif walk_primaries:
        # Primaries take the SAME seeded work-list walk as bounces —
        # inheriting the inscribed-sphere/interior-ball upper-bound
        # seeding and the double-buffered slab copies. On SMALL scenes
        # this is a MEASURED LOSER (torus field: the cone-culled nested
        # sweep prunes coherent primaries harder than the all-items flag
        # pass; benchmarks/PROFILE.md round-4 walk ablations) — so "auto"
        # keeps them on the cone path. On hierarchy-scale scenes the
        # per-mesh cone gate is useless (ONE huge mesh is always visible;
        # the cone path would roll over ALL its ~550 slabs per tile), so
        # "auto" routes primaries through the hierarchical walk. Results
        # identical either way (the per-lane slab bounds subsume the
        # per-tile cone geometrically, modulo the usual fp tie class).
        intersect_primary = intersect

    light_sampler = None
    if cfg.nee:
        from l2n_tpu.ops.nee import make_mesh_light_sampler
        light_sampler = make_mesh_light_sampler(
            mesh_count, cfg.emissive_every,
            lambda m: (bcx_ref[m], bcy_ref[m], bcz_ref[m], br2_ref[m]))

    sum_r = sum_g = sum_b = zero
    finalize = lambda: None
    for s in range(cfg.spp_per_step):
        sampler, finalize = make_kernel_sampler(
            cfg, pixel_index, sample_index + jnp.uint32(s), rng_in, rng_out,
            stream=stream)
        u1, u2 = sampler.draw2()
        rays = generate_rays(cfg, cam_ref, col.astype(f32), row.astype(f32),
                             u1, u2)
        r, g, b = shade(cfg, intersect, sampler, *rays,
                        miss_color=(1.0, 0.0, 1.0),
                        skip_empty=cfg.skip_empty_tiles,
                        intersect_primary=intersect_primary,
                        intersect_anyhit=intersect_anyhit,
                        light_sampler=light_sampler, lights=lights)
        sum_r, sum_g, sum_b = sum_r + r, sum_g + g, sum_b + b
        if cfg.rng_stateful and s + 1 < cfg.spp_per_step:
            finalize()
            rng_in = rng_out
    accumulate_and_tonemap(cfg, accum_in, accum_out, out_out,
                           sum_r, sum_g, sum_b, spp=cfg.spp_per_step)
    finalize()


def build_triangle_call(cfg, scene: TriangleScene, lights=None):
    """The raw pallas_call over one framebuffer (or one shard's slab) plus
    its static operands and per-camera helpers — used by the single-chip
    step below and, per shard, by the multi-chip shard_map step
    (l2n_tpu.parallel.step).

    Returns (call, aux); call(sched (K,2) i32, vis_table (tile_count,1+M)
    i32 in tile-id order, camera (10,4) f32, order (M,) i32, bcx, bcy, bcz,
    br2, brad (M,) f32, slab_bounds flat (M*S*5,) f32, sub_bounds flat
    (M*S*8*5,) f32, slab_count (M,) i32, inner_gap (M,) f32, balls flat
    (M*_BALLS*4,) f32, tess centers/radii (M,) x4, blocks
    VMEM, accum, output[, rng_state]).
    """
    th, tw = cfg.tile_height, cfg.tile_width
    hp, wp = cfg.padded_height, cfg.padded_width
    k = cfg.effective_tiles_per_step
    stateful = cfg.rng_stateful
    rng_planes = 8 if cfg.rng == "tinymt" else 4

    (blocks_np, bounds_np, slab_np, sub_np, scount_np, inner_gap_np,
     sphere_normals, balls_np) = pack_mesh_blocks(scene)
    # Triangle blocks stay VMEM-resident (see in_specs below); give scenes
    # that cannot fit a clear error instead of an opaque Mosaic OOM. ~96 MB
    # of v5e's 128 MB VMEM, leaving room for framebuffer tiles + scratch.
    blocks_mb = blocks_np.nbytes / 2**20
    if blocks_mb > 96:
        raise ValueError(
            f"triangle scene needs {blocks_mb:.0f} MB of VMEM-resident "
            f"blocks (~{scene.total_triangles} triangles padded across "
            f"{blocks_np.shape[0]} meshes); the VMEM-resident design caps "
            "out near 1M triangles — split the scene into more meshes "
            "with fewer triangles (padding waste) or shard it (parallel/)")
    # The BINDING capacity limit, measured (round-5): the flat sub-cluster
    # bound table lives in SMEM at 40 floats per padded slab and the chip
    # has 1 MB of SMEM — a 998k-triangle mesh (7,800 slabs, 1.22 MB sub
    # table) OOMs the Mosaic allocator long before the 96 MB VMEM guard.
    # Estimate the SMEM residents and fail with guidance instead.
    smem_bytes = (sub_np.nbytes + slab_np.nbytes + balls_np.nbytes
                  + 2 * _N_ROWS * _SLAB * 4          # staging slabs
                  + blocks_np.shape[0] * 8 * 4)      # per-mesh scalars
    if smem_bytes > int(0.90 * 2**20):
        raise ValueError(
            f"triangle scene needs ~{smem_bytes / 2**20:.2f} MB of "
            f"SMEM-resident bound tables ({sub_np.size // 40} padded "
            "slabs x 40 floats of sub-cluster bounds, plus slab bounds/"
            "balls/staging) against the chip's 1 MB SMEM — the measured "
            "ceiling of the current design is ~600k triangles in one "
            "scene (benchmarks/PROFILE.md round-5 scaling). Split the "
            "scene across shards (parallel/) or raise L2N_TRI_SLAB to "
            "trade sweep granularity for table size; folding the sub "
            "bounds into the streamed triangle blocks would lift the "
            "ceiling to the 96 MB VMEM guard (~1M).")
    # Fast (t, mesh)-only sweeps apply when normals are recoverable from
    # mesh centers and no AOV needs texcoords/barycentrics.
    fast = sphere_normals and cfg.aov not in ("tex_coords", "param_uv")
    mesh_count, _, tpad = blocks_np.shape
    # Procedural shellwalk for exact lat/long-tessellated sphere scenes
    # (the reference scene): bounce casts recompute candidate geometry
    # per lane instead of sweeping the lockstep union of mesh blocks.
    shellwalk_cfg = None
    tc_np = np.zeros((4, mesh_count), np.float32)
    if fast:
        from l2n_tpu.ops.kernels.shellwalk import (
            detect_lat_long_spheres,
            unit_inner_radius,
        )
        det = detect_lat_long_spheres(scene, cfg.disc_lat, cfg.disc_long)
        if det is not None:
            centers_np, radii_np = det
            tc_np = np.concatenate([centers_np.T, radii_np[None]], 0)
            shellwalk_cfg = (cfg.disc_lat, cfg.disc_long,
                             unit_inner_radius(cfg.disc_lat, cfg.disc_long))
    tc = [jnp.asarray(tc_np[k]) for k in range(4)]
    blocks = jnp.asarray(blocks_np)
    bounds = [jnp.asarray(bounds_np[:, j]) for j in range(4)]
    bradius = jnp.sqrt(bounds[3])
    # Flattened to 1-D for SMEM: a >=2-D SMEM window pads its minor
    # dimension to 128 (the (M,S,8,5) layout cost 1.0 MB of the 1 MB SMEM
    # budget on the reference scene); flat arrays stay at raw size.
    slab_bounds = jnp.asarray(slab_np).reshape(-1)
    sub_bounds = jnp.asarray(sub_np).reshape(-1)
    slab_count = jnp.asarray(scount_np)
    inner_gap = jnp.asarray(inner_gap_np)
    n_slabs = tpad // _SLAB
    spp = 1 << (n_slabs - 1).bit_length()
    # Static non-empty (mesh, slab) work items (flag-pass unroll list).
    items = tuple((m, s) for m in range(mesh_count)
                  for s in range(int(scount_np[m])))
    # Slab-GROUP hierarchy for huge work lists (see _HIER_MIN above). The
    # group tables are always packed and passed (tiny); the kernel only
    # USES them — hierarchical flag pass + walk-seeded primaries — when
    # the item count crosses the threshold, so every smaller scene traces
    # the identical r4 program.
    gsub = min(_GROUP, spp)
    grp_np, gcnt_np = pack_slab_groups(slab_np, scount_np, gsub)
    g_max = grp_np.shape[1]
    gpp = 1 << (g_max - 1).bit_length()
    hier = len(items) > _hier_min()
    groups_cfg = ((tuple((m, g) for m in range(mesh_count)
                         for g in range(int(gcnt_np[m]))),
                   gpp, g_max, gsub) if hier else None)
    grp_flat = jnp.asarray(grp_np).reshape(-1)
    gcnt = jnp.asarray(gcnt_np)
    # "auto" primaries walk only when some SINGLE mesh is too big for the
    # per-mesh cone gate to matter (>= 32 slabs — the cone path would roll
    # over every one of its slabs per tile: 63.9 ms/frame-spp vs the
    # walk's 17.2 on the 70k trefoil). Many-small-mesh scenes keep the
    # cone sweep, the measured winner there (torus field: walk primaries
    # cost ~+1.8 ms/frame-spp, r4/r5 walk ablations).
    walk_primaries = (_PRIMARY_MODE == "walk"
                      or (_PRIMARY_MODE == "auto" and hier
                          and int(scount_np.max()) >= 32))
    # Live interior certain-hit balls, grouped per mesh (trace-time static:
    # sphere scenes have none and pay zero unrolled work; see
    # _interior_balls). Flat (M*_BALLS*4,) SMEM layout.
    mesh_balls = tuple(
        tuple(k for k in range(_BALLS) if balls_np[m, k, 3] > 0.0)
        for m in range(mesh_count))
    balls = jnp.asarray(balls_np).reshape(-1)

    # The cone-cull table machinery is shared with the sphere kernel: mesh
    # bounding spheres ARE spheres.
    from l2n_tpu.ops.kernels.sphere_pt import full_visibility_table
    bounds_scene = SimpleNamespace(
        center_x=bounds[0], center_y=bounds[1], center_z=bounds[2],
        sqr_radius=bounds[3], count=mesh_count)
    table_fn = jax.jit(lambda camera, row_offset=jnp.float32(0.0):
                       full_visibility_table(cfg, bounds_scene, camera,
                                             row_offset=row_offset))

    bounds_np4 = bounds_np

    def mesh_order(camera: np.ndarray) -> jnp.ndarray:
        # Front-to-back mesh order for this camera (distance to bound
        # centers minus radius, ascending) — a pure camera function, cached
        # per camera like the visibility table.
        from l2n_tpu.camera.camera import ROW_POSITION
        pos = camera[ROW_POSITION, :3]
        d = (np.sqrt(((bounds_np4[:, :3] - pos) ** 2).sum(1))
             - np.sqrt(bounds_np4[:, 3]))
        return jnp.asarray(np.argsort(d).astype(np.int32))

    def tile_map(planes):
        return pl.BlockSpec(
            (planes, th, tw),
            lambda i, sched, vis: (0, sched[i, 1], sched[i, 0]),
            memory_space=pltpu.VMEM)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [smem(),                          # camera
                smem(),                          # front-to-back order (M,)
                smem(), smem(), smem(), smem(), smem(),  # bounds SoA + radius
                smem(),                          # slab bounds flat (M*S*5,)
                smem(),                          # sub bounds flat (M*S*8*5,)
                smem(),                          # slab counts (M,)
                smem(),                          # group bounds flat (M*G*5,)
                smem(),                          # group counts (M,)
                smem(),                          # inner_gap (M,)
                smem(),                          # interior balls flat (M*K*4,)
                smem(), smem(), smem(), smem(),  # tess centers + radii (M,)
                # Triangle blocks stay RESIDENT IN VMEM (3 MB for the
                # reference scene): per-mesh staging copies are then
                # on-chip VMEM->SMEM, not HBM->SMEM — the synchronous
                # wait() per mesh made the kernel DMA-latency-bound
                # (~400 us/tile-sample, ~4x the sweep compute). Scenes too
                # big for VMEM would need pl.ANY + double buffering.
                pl.BlockSpec(memory_space=pltpu.VMEM),
                tile_map(4), tile_map(3)]
    out_specs = [tile_map(4), tile_map(3)]
    out_shape = [jax.ShapeDtypeStruct((4, hp, wp), jnp.float32),
                 jax.ShapeDtypeStruct((3, hp, wp), jnp.float32)]
    aliases = {21: 0, 22: 1}  # indices include the 2 scalar-prefetch operands
    if stateful:
        in_specs.append(tile_map(rng_planes))
        out_specs.append(tile_map(rng_planes))
        out_shape.append(jax.ShapeDtypeStruct((rng_planes, hp, wp), jnp.uint32))
        aliases[23] = 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            # TWO staged slabs: the work-list walks double-buffer the
            # VMEM->SMEM copies (item j+1's slab lands while item j's
            # sweeps run; the r4 nodma ablation measured the synchronous
            # copies at ~80% of the walk). The cone-culled primary path
            # stays synchronous in buffer 0.
            pltpu.SMEM((2, _N_ROWS, _SLAB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1 if fast else 8, th, tw), jnp.float32),  # best hit
            pltpu.VMEM((1, th, tw), jnp.int32),     # best mesh / any-hit
            # Bounce-walk work lists: vector-built flag row, its SMEM copy,
            # and the compacted front-to-back item list (see _compact).
            pltpu.VMEM(((mesh_count * spp + 127) // 128, 128), jnp.int32),
            pltpu.SMEM(((mesh_count * spp + 127) // 128, 128), jnp.int32),
            pltpu.SMEM((mesh_count * spp,), jnp.int32),
            # Compacted group work list (hierarchy scenes; 1 slot otherwise).
            pltpu.SMEM((mesh_count * gpp if hier else 1,), jnp.int32),
        ],
    )

    call = pl.pallas_call(
        partial(_kernel, cfg, mesh_count, tpad, fast, shellwalk_cfg, items,
                mesh_balls, groups_cfg, walk_primaries, lights),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret_mode(),
        # The VMEM-resident triangle blocks count against Mosaic's
        # conservative 16 MB scoped-VMEM default, which caps scenes at
        # ~170k triangles (measured: a 249,600-tri mesh OOMs at 23.4 MB)
        # — far short of the 96 MB guard above. v5e has 128 MB of
        # physical VMEM; raise the limit like the sphere kernel does.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
    )
    aux = SimpleNamespace(
        bounds=bounds, bradius=bradius,
        slab=(slab_bounds, sub_bounds, slab_count, grp_flat, gcnt),
        inner_gap=inner_gap,
        balls=balls, tess=tc, blocks=blocks, mesh_count=mesh_count,
        table_fn=table_fn, mesh_order=mesh_order, stateful=stateful,
        fast=fast, shellwalk=shellwalk_cfg is not None)
    return call, aux


@register_kernel("triangle")
def build_triangle_step(cfg, scene: TriangleScene, tile_array,
                        donate: bool = True, steps_per_call: int = 1,
                        lights=None):
    """Returns step(FrameState, packed_camera) -> FrameState, ALREADY
    jitted, with per-camera precomputations (cone-cull table, front-to-back
    order) cached host-side like the sphere kernel's."""
    call, aux = build_triangle_call(cfg, scene, lights=lights)
    tile_np = np.asarray(tile_array)  # host copy for the AOT cache key
    tile_array = jnp.asarray(tile_array)
    k = cfg.effective_tiles_per_step

    def kernel_step(state: FrameState, camera, table, order) -> FrameState:
        sched = scheduled_tiles(tile_array, state.tile_offset, k)
        args = [sched, table, camera, order, *aux.bounds, aux.bradius,
                *aux.slab, aux.inner_gap, aux.balls, *aux.tess, aux.blocks,
                state.accum, state.output]
        if aux.stateful:
            args.append(state.rng_state)
        outs = call(*args)
        return FrameState(
            accum=outs[0],
            output=outs[1],
            tile_offset=advance_offset(cfg, state.tile_offset),
            iteration=state.iteration + 1,
            rng_state=outs[2] if aux.stateful else None,
        )

    if steps_per_call > 1:
        single = kernel_step

        def kernel_step(state, camera, table, order):
            return jax.lax.fori_loop(
                0, steps_per_call,
                lambda _, st: single(st, camera, table, order), state)

    # AOT executable cache (utils/aot_cache): the fully-unrolled work-list
    # walks cost ~250 s of pure Python TRACE on the 128-mesh scene; a warm
    # process loads the serialized executable instead (5m24s -> 12.3 s
    # measured, benchmarks/PROFILE.md "Round-4: cold start"). The key
    # digests everything the trace bakes in: scene buffers, config, tile
    # grid, the module-level env knobs, and lights.
    from l2n_tpu.utils.aot_cache import aot_jit
    jit_step = aot_jit(
        kernel_step, name="triangle_step",
        key_parts=(cfg,
                   [np.asarray(x) for x in
                    (scene.vertices, scene.normals, scene.tex_coords,
                     scene.indices, scene.triangle_count,
                     scene.index_offset)],
                   tile_np, steps_per_call, k,
                   (_SLAB, _SUBS, _BALLS, _DOUBLE_BUF, _PRIMARY_MODE,
                    _hier_min(), _GROUP,
                    _os.environ.get("L2N_TRI_ABLATE", "")),
                   None if lights is None else dict(vars(lights))),
        donate_argnums=(0,) if donate else ())
    cache: dict[bytes, tuple] = {}

    def step(state: FrameState, camera) -> FrameState:
        # Device-residency cache (see sphere_pt.build_sphere_step): one
        # camera upload + one table build + one sort per camera move.
        camera = np.asarray(camera, np.float32)
        key = camera.tobytes()
        entry = cache.get(key)
        if entry is None:
            cache.clear()  # one live camera at a time
            cam_dev = jnp.asarray(camera)
            entry = (cam_dev, aux.table_fn(cam_dev), aux.mesh_order(camera))
            cache[key] = entry
        return jit_step(state, *entry)

    return step
