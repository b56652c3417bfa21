"""Component-level fwd+bwd timing of the train step at the chairs config
(368x496, batch 4, bf16): which stage should the flash-training kernels
target?"""

import sys, time
sys.path.insert(0, "/root/repo")
from craft_tpu.utils.jax_setup import setup_jax
jax = setup_jax()
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from craft_tpu.config import craft_config
from craft_tpu.utils.jax_setup import train_compiler_options

CO = train_compiler_options()
from craft_tpu.models.flow_model import FlowModel, TransCorr
from craft_tpu.nn.encoder import BasicEncoder
from craft_tpu.nn.setrans import SelfAttVisPosTrans
from craft_tpu.nn.update import GMAUpdateBlock
from craft_tpu.ops.corr import CorrPyramid, build_pyramid, corr_lookup
from craft_tpu.ops.geometry import convex_upsample, coords_grid

cfg = craft_config(mixed_precision=True)
cdt = cfg.compute_dtype
H, W, B = 368, 496, 4
H8, W8 = H // 8, W // 8
U = H8 * W8
rng = np.random.RandomState(0)
key = jax.random.PRNGKey(0)
drop = {"dropout": jax.random.PRNGKey(1)}


def _sync(out):
    return jax.tree.map(lambda x: np.asarray(x[(0,) * x.ndim]), out)


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    print(f"{name:34s} {(time.perf_counter() - t0) / n * 1000:8.2f} ms",
          flush=True)
    return out


# --- full train step for reference ---
from craft_tpu.training.train_step import create_train_state, make_train_step
state, tx, _ = create_train_state(cfg, key, image_shape=(H, W), lr=2.5e-4,
                                  num_steps=1000)
step = jax.jit(make_train_step(cfg, tx, iters=12), compiler_options=CO)
batch = {
    "image1": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
    "image2": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
    "flow": rng.uniform(-5, 5, (B, H, W, 2)).astype(np.float32),
    "valid": np.ones((B, H, W), np.float32),
}
timeit("FULL train step", lambda s, b: step(s, b, jax.random.PRNGKey(1))[1],
       state, batch, n=6)

# --- components: fwd+bwd each ---
img = jnp.asarray(rng.uniform(-1, 1, (2 * B, H, W, 3)).astype(np.float32))
fnet = BasicEncoder(output_dim=256, norm_fn="instance", dropout=0.0,
                    dtype=cdt, train=True)
fvars = fnet.init(key, img[:1])


def fnet_loss(v, x):
    return jnp.sum(fnet.apply(v, x).astype(jnp.float32) ** 2) * 1e-6


timeit("fnet fwd+bwd (2B frames)", jax.jit(jax.grad(fnet_loss), compiler_options=CO), fvars, img)

fmap = jnp.asarray(rng.randn(B, H8, W8, 256).astype(np.float32)) * 0.5
SAV = nn.remat(SelfAttVisPosTrans, static_argnums=(2,))
f2 = SAV(cfg.f2, dtype=cdt)
f2v = f2.init({**drop, "params": key}, fmap[:1].astype(cdt), False)


def f2_loss(v, x):
    out = f2.apply(v, x, False, rngs=drop)
    return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6


timeit("f2 fwd+bwd (remat, dropout)", jax.jit(jax.grad(f2_loss), compiler_options=CO), f2v,
       fmap.astype(cdt))

inp = jnp.asarray(rng.randn(B, H8, W8, 128).astype(np.float32)).astype(cdt)
intra = SAV(cfg.intra, dtype=cdt)
iv = intra.init({**drop, "params": key}, inp[:1], False)


def intra_loss(v, x):
    out = intra.apply(v, x, False, rngs=drop)
    return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6


timeit("intra fwd+bwd (remat, dropout)", jax.jit(jax.grad(intra_loss), compiler_options=CO), iv,
       inp)

TCr = nn.remat(TransCorr, static_argnums=(5, 6))
tc = TCr(cfg, dtype=cdt)
tcv = tc.init({**drop, "params": key}, fmap[:1], fmap[:1], None, None, False,
              None)


def corr_loss(v, a, b):
    vol = tc.apply(v, a, b, None, None, False, None, rngs=drop)
    pyr = build_pyramid(vol, B, H8, W8, 4, 4, do_global_norm=True,
                        level_dtype=jnp.bfloat16)
    return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in pyr.levels) * 1e-6


timeit("inter corr+pyramid fwd+bwd", jax.jit(jax.grad(corr_loss), compiler_options=CO), tcv,
       fmap, fmap)

# refinement loop fwd+bwd (materialized attention probs input)
att = jnp.asarray(
    rng.rand(B, 4, U, U).astype(np.float32) / U).astype(cdt)
ub = GMAUpdateBlock(cfg, dtype=cdt)
net0 = jnp.zeros((B, H8, W8, 128), cdt)
vol = jnp.asarray(rng.randn(B, U, 1, U).astype(np.float32))
pyr = build_pyramid(vol, B, H8, W8, 4, 4, level_dtype=jnp.bfloat16)
corr0 = corr_lookup(pyr, coords_grid(B, H8, W8))
ubv = ub.init({**drop, "params": key}, net0, inp, corr0.astype(cdt),
              jnp.zeros((B, H8, W8, 2), cdt), att)


def loop_loss(v, levels, att, net, inp):
    p = CorrPyramid(levels=levels, batch=B, h1=H8, w1=W8, radius=4)
    coords0 = coords_grid(B, H8, W8)
    coords1 = coords_grid(B, H8, W8)

    def step_fn(carry, _):
        net, coords1 = carry
        coords1 = jax.lax.stop_gradient(coords1)
        corr = corr_lookup(p, coords1)
        net, mask, delta = ub.apply(v, net, inp, corr.astype(cdt),
                                    (coords1 - coords0).astype(cdt), att)
        coords1 = coords1 + delta.astype(jnp.float32)
        up = convex_upsample(coords1 - coords0, mask.astype(jnp.float32))
        return (net, coords1), up

    (_, _), ups = jax.lax.scan(step_fn, (net, coords1), None, length=12)
    return jnp.sum(ups.astype(jnp.float32) ** 2) * 1e-6


timeit("12-iter loop fwd+bwd", jax.jit(jax.grad(loop_loss), compiler_options=CO), ubv,
       pyr.levels, att, net0, inp)
