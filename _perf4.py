import time, numpy as np, jax
from l2n_tpu.config import RenderConfig
from l2n_tpu.camera import Camera
from l2n_tpu.render.state import init_frame_state
from l2n_tpu.render.tiles import tile_grid
from l2n_tpu.scene import compute_spheres
from l2n_tpu.ops.kernels.sphere_pt import build_sphere_step
from l2n_tpu.render.step import build_render_step

cfg = RenderConfig(width=256, height=128, tile_width=128, tile_height=32, tiles_per_step=3).validate()
scene = compute_spheres(cfg.sphere_count, cfg.world_size, cfg.scene_seed)
so_step = build_render_step(cfg, scene, backend='xla')
sp_step = jax.jit(build_sphere_step(cfg, scene, tile_grid(cfg)), donate_argnums=0)
cam = Camera.from_config(cfg).packed()
so, sp = init_frame_state(cfg), init_frame_state(cfg)
t0=time.perf_counter()
for _ in range(3):
    so = so_step(so, cam); sp = sp_step(sp, cam)
ao, ap = np.asarray(so.accum), np.asarray(sp.accum)
d = np.abs(ao-ap)
print('compile+3 steps: %.0f s' % (time.perf_counter()-t0), flush=True)
print('parity: counts', (ao[3]==ap[3]).all(), 'rmse', np.sqrt((d**2).mean()), 'frac', (d>1e-3).mean(), flush=True)

def bench(**kw):
    cfg = RenderConfig(width=1024, height=1024, tile_height=32, tile_width=128, tiles_per_step=256).validate()
    scene = compute_spheres(cfg.sphere_count, cfg.world_size, cfg.scene_seed)
    step = jax.jit(build_sphere_step(cfg, scene, tile_grid(cfg), **kw), donate_argnums=0)
    cam = Camera.from_config(cfg).packed()
    st = init_frame_state(cfg)
    st = step(st, cam); st.output.block_until_ready()
    N = 30
    t0 = time.perf_counter()
    for _ in range(N): st = step(st, cam)
    st.output.block_until_ready()
    return 1024*1024/((time.perf_counter()-t0)/N)/1e6

print('cone cull table: %.1f Ms/s' % bench(cone_cull=True), flush=True)
