"""Fused triangle path-tracing kernel (Möller-Trumbore over the mesh soup).

TPU-native rebuild of /root/reference/src/shaders/triangle_pathtracing.cs.glsl.
Placeholder module for the Pallas implementation — the triangle scene
currently renders through the XLA backend (`l2n_tpu.render.step`), which is
the same brute-force sweep the reference runs (128 meshes x 256 triangles
per ray, triangle_pathtracing.cs.glsl:164-175).

Planned kernel design (pairwise sweep): pixels ride the sublanes, triangles
the lanes — for each pixel column (32, 1) and 128-triangle chunk (1, 128)
the kernel evaluates all (32, 128) ray/triangle pairs with pure vector ops
(no per-triangle scalar loads), tracking the running nearest hit and its
interpolated attributes with lane-wise selects.
"""
