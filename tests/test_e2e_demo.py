"""End-to-end demo smoke: gen_flow on a synthetic image pair (the analog of
the reference's bundled imgs/frame_0047-0048 smoke path, SURVEY.md §3.5)."""

import os

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow  # heavy tier: interpret-mode kernels / full models (run with -m slow)


def test_gen_flow_demo(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from craft_tpu.config import raft_config
    from craft_tpu.eval.demo import gen_flow
    from craft_tpu.models.flow_model import FlowModel

    # Synthetic pair: random texture, second frame shifted by (3, 2).
    H, W = 128, 128
    base = rng.uniform(0, 255, (H + 8, W + 8, 3)).astype(np.uint8)
    img1 = base[2:2 + H, 3:3 + W]
    img2 = base[:H, :W]
    p1 = str(tmp_path / "f1.png")
    p2 = str(tmp_path / "f2.png")
    Image.fromarray(img1).save(p1)
    Image.fromarray(img2).save(p2)

    cfg = raft_config(mixed_precision=False)
    model = FlowModel(cfg=cfg, train=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)),
                           iters=1)

    out_dir = str(tmp_path / "out")
    flow = gen_flow(cfg, variables, p1, p2, output_path=out_dir, iters=4)
    assert flow.shape == (H, W, 2)
    assert np.isfinite(flow).all()
    pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert pngs, "demo should write a flow visualization"


def test_flop_count():
    import jax

    from craft_tpu.config import raft_config
    from craft_tpu.eval.demo import count_model_flops
    from craft_tpu.models.flow_model import FlowModel
    import jax.numpy as jnp

    cfg = raft_config(mixed_precision=False)
    model = FlowModel(cfg=cfg, train=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)),
                           jnp.zeros((1, 128, 128, 3)), iters=1)
    flops = count_model_flops(cfg, variables, (128, 128), iters=2)
    assert flops > 1e9  # should be multiple GFLOPs even tiny


def test_attention_dump(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from craft_tpu.config import craft_config
    from craft_tpu.eval.attvis import dump_attention, vis_attention
    from craft_tpu.models.flow_model import FlowModel

    cfg = craft_config(mixed_precision=False)
    model = FlowModel(cfg=cfg, train=False)
    H, W = 64, 64
    img = jnp.zeros((1, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), img, img, iters=1)

    img1 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    save = str(tmp_path / "dumps.npz")
    dumps = dump_attention(cfg, variables, img1, img2, save, iters=1)
    assert any("corr_volume" in k for k in dumps)
    assert any("attn_probs" in k for k in dumps)

    # Render the f2 attention for two query points.
    key = next(k for k in dumps if "attn_probs" in k)
    attn = dumps[key][0]  # [M, U, U]
    vis_attention(attn, img2[0].astype(np.uint8), [(2, 3), (4, 4)],
                  str(tmp_path / "vis"), (H // 8, W // 8))
    assert len(os.listdir(tmp_path / "vis")) == 2
