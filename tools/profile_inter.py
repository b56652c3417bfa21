"""Sub-profile of the inter-corr path: bias build vs QK proj vs fused kernel
vs global-norm+pyramid."""

import sys, time
sys.path.insert(0, "/root/repo")
from craft_tpu.utils.jax_setup import setup_jax
jax = setup_jax()
import jax.numpy as jnp
import numpy as np

from craft_tpu.nn.setrans import sliding_pos_biases
from craft_tpu.ops.pallas.mode_attention import fused_agg_corr, scores_global_max
from craft_tpu.ops.corr import build_pyramid

H8, W8 = 55, 128
U = H8 * W8
M, md = 4, 64
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

biases = jnp.asarray(rng.randn(15, 15).astype(np.float32))
bias_fn = jax.jit(lambda b: sliding_pos_biases(b, H8, W8))
bias = timeit("bias table build", bias_fn, biases)

q = jnp.asarray(rng.randn(M, U, md).astype(np.float32))
k = jnp.asarray(rng.randn(M, U, md).astype(np.float32))

timeit("scores_global_max", jax.jit(
    lambda a, b: scores_global_max(a, b, 0.125)), q, k)

corr_fn = jax.jit(lambda a, b, bi: fused_agg_corr(a, b, bi, 100.0, 0.5,
                                                  0.3, 0.1))
vol = timeit("fused_agg_corr", corr_fn, q, k, bias)

def pyr_fn(v):
    return build_pyramid(v[None, :, None, :], 1, H8, W8, 4, 4,
                         do_global_norm=True).levels
timeit("global norm + pyramid", jax.jit(pyr_fn), vol)

# LayerNorm of the vispos encoder at this size
x = jnp.asarray(rng.randn(1, U, 256).astype(np.float32))
def ln(x):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + 1e-12)
timeit("vispos layernorm x2", jax.jit(lambda a: (ln(a), ln(a))), x)
