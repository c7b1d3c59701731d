"""Procedural non-sphere OBJ scene generation (benchmark + test asset).

The reference ships no OBJ assets (its TODO wishes for "Obj loading with
tinyobjloader", /root/reference/TODO.md:10, never implemented), so the
OBJ-path benchmarks synthesize a deterministic scene: a field of randomly
oriented tori in the same ±worldSize/2 volume the procedural sphere scene
uses (src/main.cpp:656-669). Tori are the adversarial case for this
kernel's sphere-bound acceleration: curved, non-convex, with a hole — a
mesh bound test cannot shortcut them the way lat/long spheres can
(no shellwalk, no inscribed-sphere certain-hit).

Emitted as OBJ TEXT so benchmarks exercise the full load_obj path.
"""

from __future__ import annotations

import io

import numpy as np


def _rotation(rng: np.random.Generator) -> np.ndarray:
    """Uniform random rotation (QR of a Gaussian, sign-fixed)."""
    q, r = np.linalg.qr(rng.standard_normal((3, 3)))
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 2] *= -1
    return q


def torus_field_obj(n_tori: int = 24, seg_u: int = 24, seg_v: int = 16,
                    world_size: float = 1024.0, seed: int = 5) -> str:
    """OBJ text: `n_tori` randomly placed/oriented tori.

    Each torus is its own `o` group -> its own mesh, so the emissive-every-
    16th material rule (sphere_pathtracing.cs.glsl:285-290) lights the scene
    the same way the sphere scenes are lit. seg_u x seg_v quads -> 2 x
    seg_u x seg_v triangles per torus (default 768).
    """
    rng = np.random.default_rng(seed)
    out = io.StringIO()
    out.write("# torus field (deterministic, l2n_tpu.scene.procgen)\n")
    base = 1  # OBJ indices are 1-based and file-global

    iu = np.arange(seg_u, dtype=np.float64)
    iv = np.arange(seg_v, dtype=np.float64)
    phi = (2.0 * np.pi / seg_u) * iu          # around the main axis
    psi = (2.0 * np.pi / seg_v) * iv          # around the tube
    cphi, sphi = np.cos(phi), np.sin(phi)
    cpsi, spsi = np.cos(psi), np.sin(psi)

    for m in range(n_tori):
        half = 0.5 * world_size
        center = rng.uniform(-half, half, size=3)
        major = rng.uniform(0.02, 0.05) * world_size
        minor = major * rng.uniform(0.25, 0.45)
        rot = _rotation(rng)

        # Ring frame: ring point R*(cphi, sphi, 0); tube offset
        # r*(cpsi*cphi, cpsi*sphi, spsi); normal (cpsi*cphi, cpsi*sphi, spsi).
        ring = np.stack([cphi[:, None] * (major + minor * cpsi[None, :]),
                         sphi[:, None] * (major + minor * cpsi[None, :]),
                         np.broadcast_to(minor * spsi[None, :],
                                         (seg_u, seg_v))], axis=-1)
        nrm = np.stack([cphi[:, None] * cpsi[None, :],
                        sphi[:, None] * cpsi[None, :],
                        np.broadcast_to(spsi[None, :], (seg_u, seg_v))],
                       axis=-1)
        pos = ring.reshape(-1, 3) @ rot.T + center
        nrm = nrm.reshape(-1, 3) @ rot.T

        out.write(f"o torus{m}\n")
        for p in pos:
            out.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for n in nrm:
            out.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
        for u in range(seg_u):
            for v in range(seg_v):
                a = base + u * seg_v + v
                b = base + ((u + 1) % seg_u) * seg_v + v
                c = base + ((u + 1) % seg_u) * seg_v + (v + 1) % seg_v
                d = base + u * seg_v + (v + 1) % seg_v
                out.write(f"f {a}//{a} {b}//{b} {c}//{c}\n")
                out.write(f"f {a}//{a} {c}//{c} {d}//{d}\n")
        base += seg_u * seg_v
    return out.getvalue()
