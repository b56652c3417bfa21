"""Per-component batch-scaling profile at Sintel size: which stage scales
sublinearly with batch?  Prints ms and per-sample throughput at B in (1, 4).
"""

import sys, time
sys.path.insert(0, "/root/repo")

from craft_tpu.utils.jax_setup import setup_jax
jax = setup_jax()
import jax.numpy as jnp
import numpy as np

from craft_tpu.config import craft_config
from craft_tpu.models.flow_model import TransCorr
from craft_tpu.nn.encoder import BasicEncoder
from craft_tpu.nn.setrans import SelfAttVisPosTrans
from craft_tpu.nn.update import GMAUpdateBlock
from craft_tpu.ops.corr import CorrPyramid, build_pyramid, corr_lookup
from craft_tpu.ops.geometry import convex_upsample, coords_grid

cfg = craft_config(mixed_precision=True)
cdt = cfg.compute_dtype
H, W = 440, 1024
H8, W8 = H // 8, W // 8
rng = np.random.RandomState(0)
key = jax.random.PRNGKey(0)


def _sync(out):
    return jax.tree.map(lambda x: np.asarray(x[(0,) * x.ndim]), out)


def timeit(name, B, fn, *args, n=6):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"B={B} {name:28s} {dt * 1000:8.2f} ms "
          f"({dt * 1000 / B:7.2f} ms/sample)", flush=True)
    return out


for B in (4,):
    img = jnp.asarray(rng.uniform(-1, 1, (2 * B, H, W, 3)).astype(np.float32))
    fnet = BasicEncoder(output_dim=256, norm_fn="instance", dtype=cdt,
                        train=False)
    fvars = fnet.init(key, img[:1])
    fmaps = timeit("fnet (2B frames)", B, jax.jit(
        lambda v, x: fnet.apply(v, x)), fvars, img)

    fmap = jnp.asarray(rng.randn(B, H8, W8, 256).astype(np.float32))
    f2 = SelfAttVisPosTrans(cfg.f2, dtype=cdt)
    f2v = f2.init(key, fmap[:1].astype(cdt))
    timeit("f2 transformer", B, jax.jit(
        lambda v, x: f2.apply(v, x)), f2v, fmap.astype(cdt))

    inp = jnp.asarray(rng.randn(B, H8, W8, 128).astype(np.float32)).astype(cdt)
    intra = SelfAttVisPosTrans(cfg.intra, dtype=cdt)
    iv = intra.init(key, inp[:1])
    attention = timeit("intra attention", B, jax.jit(
        lambda v, x: intra.apply(v, x)), iv, inp)

    tc = TransCorr(cfg, dtype=cdt)
    tcv = tc.init(key, fmap[:1], fmap[:1])

    def corr_fn(v, a, b):
        from craft_tpu.nn.setrans import fused_norm_available
        from craft_tpu.ops.corr import pyramid_from_level0
        if fused_norm_available(cfg.inter, H8, W8, True):
            vol = tc.apply(v, a, b, fused_norm_dtype=jnp.bfloat16)
            return pyramid_from_level0(vol, B, H8, W8, 4, 4).levels
        vol = tc.apply(v, a, b)
        return build_pyramid(vol, B, H8, W8, 4, 4, do_global_norm=True).levels

    levels = timeit("inter corr + pyramid", B, jax.jit(corr_fn), tcv, fmap,
                    fmap)

    ub = GMAUpdateBlock(cfg, dtype=cdt)
    net = jnp.zeros((B, H8, W8, 128), cdt)
    p0 = CorrPyramid(levels=levels, batch=B, h1=H8, w1=W8, radius=4)
    corr0 = corr_lookup(p0, coords_grid(B, H8, W8))
    ubv = ub.init(key, net, inp, corr0.astype(cdt),
                  jnp.zeros((B, H8, W8, 2), cdt), attention)

    def loop_fn(v, levels, att, net, inp):
        p = CorrPyramid(levels=levels, batch=B, h1=H8, w1=W8, radius=4)
        coords0 = coords_grid(B, H8, W8)
        coords1 = coords_grid(B, H8, W8)

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

    timeit("12-iter refinement loop", B, jax.jit(loop_fn), ubv, levels,
           attention, net, inp)
    print()
