"""TPU timing: corr lookup variants over 12 scan iterations at Sintel size."""

import sys, time
sys.path.insert(0, "/root/repo")
from craft_tpu.utils.jax_setup import setup_jax
jax = setup_jax()
import jax.numpy as jnp
import numpy as np

from craft_tpu.ops.corr import (CorrPyramid, PackedPyramid, build_pyramid,
                                corr_lookup_lerp, corr_lookup_mxu,
                                corr_lookup_packed, corr_lookup_window,
                                pack_pyramid)
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
pyr = build_pyramid(vol, 1, H8, W8, 4, 4)

def scan12(lookup):
    def fn(levels, coords):
        p = CorrPyramid(levels=levels, batch=1, h1=H8, w1=W8, radius=4)
        def step(c, _):
            return c + 0.01, lookup(p, c)
        _, outs = jax.lax.scan(step, coords, None, length=12)
        return outs[-1]
    return jax.jit(fn)

coords = coords_grid(1, H8, W8)
timeit("12x mxu lookup", scan12(corr_lookup_mxu), pyr.levels, coords)
pyr16 = build_pyramid(vol, 1, H8, W8, 4, 4, level_dtype=jnp.bfloat16)

def scan12_packed(levels, coords, dtype):
    p = CorrPyramid(levels=levels, batch=1, h1=H8, w1=W8, radius=4)
    pp = pack_pyramid(p)
    def fn(packed, coords):
        pp2 = pp._replace(packed=packed)
        def step(c, _):
            return c + 0.01, corr_lookup_packed(pp2, c)
        _, outs = jax.lax.scan(step, coords, None, length=12)
        return outs[-1]
    return jax.jit(fn), pp.packed

fn, packed = scan12_packed(pyr.levels, coords, jnp.float32)
timeit("12x packed lookup f32", fn, packed, coords)
fn16, packed16 = scan12_packed(pyr16.levels, coords, jnp.bfloat16)
timeit("12x packed lookup bf16", fn16, packed16, coords)

# floor: sum all levels once per iteration (pure stream)
def stream_floor(levels, coords):
    def step(c, _):
        s = sum(jnp.sum(l, axis=(1, 2)) for l in levels)
        return c + 0.01, s
    _, outs = jax.lax.scan(step, coords, None, length=12)
    return outs[-1]
timeit("12x full-stream floor", jax.jit(stream_floor), pyr.levels, coords)
