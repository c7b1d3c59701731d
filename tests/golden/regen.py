"""Regenerate the golden-image accumulations IN PLACE from the XLA oracle.

Run only when a deliberate, understood numeric change lands in the shared
intersection/shading bodies (e.g. the round-4 FMA reassociation of the
sphere-sweep `c` term, which moves a handful of tangent pixels by design).
The config and pinned camera stored in each npz are preserved verbatim, so
the regenerated golden differs ONLY by the accumulation planes.

    python tests/golden/regen.py            # regenerate both scenes
    python tests/golden/regen.py sphere     # just one
"""

import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent
sys.path.insert(0, str(HERE.parent))  # for running from the repo root

from test_golden_render import (  # noqa: E402
    GOLDEN_PATH, TRI_GOLDEN_PATH, _load_golden, render, render_triangle)


def regen(path, renderer):
    cfg, old, vm = _load_golden(path)
    out = renderer(cfg, "xla", vm)
    accum = out[0] if isinstance(out, tuple) else out
    d = np.abs(accum - old)
    print(f"{path.name}: moved values {(d > 1e-3).mean():.2e} "
          f"rmse {np.sqrt((d ** 2).mean()):.2e}")
    if (d == 0).all():
        print(f"  {path.name}: bit-identical — left untouched")
        return
    payload = {"config": np.frombuffer(cfg.to_json().encode(), np.uint8),
               "accum": accum}
    if vm is not None:
        payload["view_matrix"] = vm
    np.savez_compressed(path, **payload)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "sphere"):
        regen(GOLDEN_PATH, render)
    if which in ("both", "triangle"):
        regen(TRI_GOLDEN_PATH, render_triangle)
