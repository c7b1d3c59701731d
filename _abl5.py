import time, jax
from l2n_tpu.config import RenderConfig
from l2n_tpu.camera import Camera
from l2n_tpu.render.state import init_frame_state
from l2n_tpu.render.tiles import tile_grid
from l2n_tpu.scene import compute_spheres
from l2n_tpu.ops.kernels.sphere_pt import build_sphere_step

cfg = RenderConfig(width=1024, height=1024, tile_height=32, tile_width=128,
                   tiles_per_step=256, spp_per_step=4).validate()
scene = compute_spheres(cfg.sphere_count, cfg.world_size, cfg.scene_seed)
t0=time.perf_counter()
step = jax.jit(build_sphere_step(cfg, scene, tile_grid(cfg)), donate_argnums=0)
cam = Camera.from_config(cfg).packed()
st = init_frame_state(cfg)
st = step(st, cam); st.output.block_until_ready()
print('compile: %.0f s' % (time.perf_counter()-t0), flush=True)
best = 1e9
for rep in range(4):
    N = 20
    t0 = time.perf_counter()
    for _ in range(N): st = step(st, cam)
    st.output.block_until_ready()
    best = min(best, (time.perf_counter()-t0)/N)
print('full: %.2f ms/step(4spp) => %.1f Msamples/s' % (best*1e3, 4*1024*1024/best/1e6), flush=True)
