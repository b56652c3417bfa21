"""Data-parallel serving over the device mesh: a batch sharded across 8
virtual devices must produce the same flows as unsharded inference (GSPMD
inserts the collectives; reference analog: DataParallel eval,
train.py:179-183)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: interpret-mode kernels / full models (run with -m slow)


def test_sharded_inference_matches_single_device(rng):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from craft_tpu.config import craft_config
    from craft_tpu.models.flow_model import FlowModel

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = Mesh(np.array(devs[:8]), axis_names=("data",))

    cfg = craft_config(mixed_precision=False)
    model = FlowModel(cfg=cfg, train=False)
    B, H, W = 8, 64, 64
    img1 = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img1[:1]),
                           jnp.asarray(img2[:1]), iters=1)

    def fwd(v, a, b):
        return model.apply(v, a, b, iters=2)[1][-1]

    want = np.asarray(jax.jit(fwd)(variables, jnp.asarray(img1),
                                   jnp.asarray(img2)))

    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    v_repl = jax.tree.map(lambda x: jax.device_put(x, repl), variables)
    a = jax.device_put(jnp.asarray(img1), batch_sh)
    b = jax.device_put(jnp.asarray(img2), batch_sh)
    sharded_fwd = jax.jit(fwd, in_shardings=(repl, batch_sh, batch_sh),
                          out_shardings=batch_sh)
    with mesh:
        got = np.asarray(sharded_fwd(v_repl, a, b))

    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
