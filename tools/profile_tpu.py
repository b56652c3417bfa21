"""Component-level TPU timing for the CRAFT forward at Sintel size.

Times: encoders, f2 transformer, intra attention, inter correlation volume +
pyramid, and the 12-iteration refinement loop, each as its own jitted fn.
"""

import sys, time
sys.path.insert(0, "/root/repo")

from craft_tpu.utils.jax_setup import setup_jax
jax = setup_jax()
import jax.numpy as jnp
import numpy as np
from flax.core import FrozenDict

from craft_tpu.config import craft_config
from craft_tpu.models.flow_model import FlowModel, TransCorr
from craft_tpu.nn.encoder import BasicEncoder
from craft_tpu.nn.setrans import SelfAttVisPosTrans
from craft_tpu.nn.update import GMAUpdateBlock
from craft_tpu.ops.corr import build_pyramid, corr_lookup
from craft_tpu.ops.geometry import convex_upsample, coords_grid

cfg = craft_config(mixed_precision=True)
cdt = cfg.compute_dtype
H, W = 440, 1024
H8, W8 = H // 8, W // 8
rng = np.random.RandomState(0)

def _sync(out):
    # Force completion with one tiny device->host transfer per leaf
    # (block_until_ready returns early through the axon tunnel).
    return jax.tree.map(lambda x: np.asarray(x[(0,) * x.ndim]), out)


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:30s} {dt * 1000:8.2f} ms")
    return out

key = jax.random.PRNGKey(0)
img = jnp.asarray(rng.uniform(-1, 1, (2, H, W, 3)).astype(np.float32))

fnet = BasicEncoder(output_dim=256, norm_fn="instance", dtype=cdt, train=False)
fvars = fnet.init(key, img)
f_fn = jax.jit(lambda v, x: fnet.apply(v, x))
fmaps = timeit("fnet (2 frames)", f_fn, fvars, img)

fmap = jnp.asarray(rng.randn(1, H8, W8, 256).astype(np.float32))
f2 = SelfAttVisPosTrans(cfg.f2, dtype=cdt)
f2v = f2.init(key, fmap.astype(cdt))
f2_fn = jax.jit(lambda v, x: f2.apply(v, x))
timeit("f2 transformer", f2_fn, f2v, fmap.astype(cdt))

inp = jnp.asarray(rng.randn(1, H8, W8, 128).astype(np.float32)).astype(cdt)
intra = SelfAttVisPosTrans(cfg.intra, dtype=cdt)
iv = intra.init(key, inp)
intra_fn = jax.jit(lambda v, x: intra.apply(v, x))
attention = timeit("intra attention", intra_fn, iv, inp)

tc = TransCorr(cfg, dtype=cdt)
tcv = tc.init(key, fmap, fmap)
def corr_fn(v, a, b):
    vol = tc.apply(v, a, b)
    pyr = build_pyramid(vol, 1, H8, W8, 4, 4, do_global_norm=True)
    return pyr.levels
timeit("inter corr + pyramid", jax.jit(corr_fn), tcv, fmap, fmap)

# refinement loop
vol = jnp.asarray(rng.randn(1, H8 * W8, 1, H8 * W8).astype(np.float32))
pyr = build_pyramid(vol, 1, H8, W8, 4, 4)
ub = GMAUpdateBlock(cfg, dtype=cdt)
net = jnp.zeros((1, H8, W8, 128), cdt)
corr0 = corr_lookup(pyr, coords_grid(1, H8, W8))
ubv = ub.init(key, net, inp, corr0.astype(cdt),
              jnp.zeros((1, H8, W8, 2), cdt), attention)

def loop_fn(v, levels, att, net, inp):
    pyr2 = build_pyramid.__wrapped__ if False else None
    from craft_tpu.ops.corr import CorrPyramid
    p = CorrPyramid(levels=levels, batch=1, h1=H8, w1=W8, radius=4)
    coords0 = coords_grid(1, H8, W8)
    coords1 = coords_grid(1, H8, W8)
    def step(carry, _):
        net, coords1 = carry
        corr = corr_lookup(p, coords1)
        flow = coords1 - coords0
        net, mask, delta = ub.apply(v, net, inp, corr.astype(cdt),
                                    flow.astype(cdt), att)
        coords1 = coords1 + delta.astype(jnp.float32)
        up = convex_upsample(coords1 - coords0, mask.astype(jnp.float32))
        return (net, coords1), up
    (_, _), ups = jax.lax.scan(step, (net, coords1), None, length=12)
    return ups[-1]

timeit("12-iter refinement loop", jax.jit(loop_fn), ubv, pyr.levels,
       attention, net, inp)

def lookup_only(levels, coords):
    from craft_tpu.ops.corr import CorrPyramid
    p = CorrPyramid(levels=levels, batch=1, h1=H8, w1=W8, radius=4)
    def step(c, _):
        return c + 0.01, corr_lookup(p, c)
    _, outs = jax.lax.scan(step, coords_grid(1, H8, W8), None, length=12)
    return outs[-1]
timeit("12x corr lookup only", jax.jit(lookup_only), pyr.levels,
       coords_grid(1, H8, W8))
