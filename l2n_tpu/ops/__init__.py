"""Device ops: intersection, environment lights, path tracing.

Everything here is written in structure-of-arrays component form over
arbitrary-shaped lane arrays, so the same tracing code runs (a) as the
vectorized pure-XLA *oracle* renderer — the analog of the reference's CPU
renderer used as a test oracle (/root/reference/src/main.cpp:206-599) — and
(b) inside Pallas TPU kernels over VMEM tiles (`l2n_tpu.ops.kernels`).
"""

from l2n_tpu.ops import envlight, intersect, pathtrace  # noqa: F401
