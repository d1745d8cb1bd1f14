import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np, jax, time
from raytracer_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
from raytracer_tpu.camera.camera import derive_camera
from raytracer_tpu.render import pallas_kernel as pk
from raytracer_tpu.render.options import TraceOptions
from raytracer_tpu.scene import presets

# force multi-chunk so the sorted (permuted) path runs on hardware
orig = pk._pick_chunk_spp
pk._pick_chunk_spp = lambda spp, *a, **k: min(spp, 3)
scene, cam, *_ = presets.get_config('cover', 256, 64)
dcam = derive_camera(cam)
opts = TraceOptions(max_depth=8, russian_roulette_depth=5,
                    cluster_scan=False)
key = jax.random.PRNGKey(7)
imgs, segs = [], []
for ks in (1, 4):
    img, st = pk.render_image_pallas(scene, dcam, 256, 64, 10, key, opts,
                                     return_stats=True, k_slots=ks)
    imgs.append(np.asarray(img)); segs.append(float(st['segments']))
print('device K1 vs K4 bitwise:', np.array_equal(imgs[0], imgs[1]),
      'segs:', segs[0], segs[1], 'maxdiff:', np.abs(imgs[0]-imgs[1]).max())
pk._pick_chunk_spp = orig

# compare against jnp tracer statistically (device)
from raytracer_tpu.render.tracer import render_image_jnp
imgj = np.asarray(render_image_jnp(scene, dcam, 256, 64, 10, key,
                                   TraceOptions(max_depth=8)))
d = np.abs(imgs[1] - imgj)
print('pallas(K4,rr5) vs jnp(rr0) mean|d|:', np.nanmean(d), 'nan px:', int(np.isnan(d).sum()))
