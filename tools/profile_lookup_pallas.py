"""TPU timing: Pallas lookup vs MXU lookup over 12 scan iterations, Sintel size."""

import sys, time
sys.path.insert(0, "/root/repo")
from craft_tpu.utils.jax_setup import setup_jax
jax = setup_jax()
import jax.numpy as jnp
import numpy as np

from craft_tpu.ops.corr import CorrPyramid, build_pyramid, corr_lookup_mxu
from craft_tpu.ops.pallas.corr_lookup import corr_lookup_pallas
from craft_tpu.ops.geometry import coords_grid

H8, W8 = 55, 128
U = H8 * W8
rng = np.random.RandomState(0)

def _sync(out):
    return jax.tree.map(lambda x: np.asarray(x[(0,) * x.ndim]), out)

def timeit(name, fn, *args, n=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    print(f"{name:30s} {(time.perf_counter() - t0) / n * 1000:8.2f} ms")
    return out

vol = jnp.asarray(rng.randn(1, U, 1, U).astype(np.float32))

def scan12(lookup, levels):
    def fn(levels, coords):
        p = CorrPyramid(levels=levels, batch=1, h1=H8, w1=W8, radius=4)
        def step(c, _):
            return c + 0.01, lookup(p, c)
        _, outs = jax.lax.scan(step, coords, None, length=12)
        return outs[-1]
    return jax.jit(fn)

coords = coords_grid(1, H8, W8) + 3.7
for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
    pyr = build_pyramid(vol, 1, H8, W8, 4, 4, level_dtype=dt)
    a = timeit(f"12x mxu lookup {name}", scan12(corr_lookup_mxu, pyr.levels), pyr.levels, coords)
    b = timeit(f"12x pallas lookup {name}", scan12(corr_lookup_pallas, pyr.levels), pyr.levels, coords)
    print(f"   max diff {name}:", float(jnp.abs(a - b).max()))
