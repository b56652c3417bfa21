"""Compiled-kernel verification on real TPU: full CRAFT forward with the
Pallas fast paths (auto-enabled on TPU) vs the torch reference on host CPU.

The pallas kernels are unit-tested in interpret mode on CPU; this checks the
actual Mosaic-compiled kernels end-to-end.
"""

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import torch

from craft_tpu.utils.jax_setup import setup_jax
jax = setup_jax()
import jax.numpy as jnp

from reference_oracle import build_reference_model
from craft_tpu.config import craft_config
from craft_tpu.models.flow_model import FlowModel
from craft_tpu.utils.torch_convert import convert_torch_state

print("backend:", jax.default_backend())
ref, _ = build_reference_model("craft")
state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

cfg = craft_config(mixed_precision=False)
model = FlowModel(cfg=cfg, train=False)
rng = np.random.RandomState(1)
H, W = 128, 128
img1 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
img2 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)

variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img1),
                       jnp.asarray(img2), iters=1)
variables, _ = convert_torch_state(state, variables, strict=True)

import dataclasses

with torch.no_grad():
    t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
    t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2))
    _, ref_up = ref(t1, t2, iters=6, test_mode=1)
want = ref_up.numpy().transpose(0, 2, 3, 1)

import contextlib

for label, c in [
    ("pallas-highest", cfg),
    ("pallas", cfg),
    ("mixed-bf16", craft_config(mixed_precision=True)),
    ("xla-only", cfg.replace(
        inter=dataclasses.replace(cfg.inter, use_pallas="off"),
        f2=dataclasses.replace(cfg.f2, use_pallas="off"),
        intra=dataclasses.replace(cfg.intra, use_pallas="off"))),
]:
    m = FlowModel(cfg=c, train=False)
    prec = jax.default_matmul_precision("highest") if "highest" in label \
        else contextlib.nullcontext()
    with prec:
        lowres, flows = jax.jit(
            lambda v, a, b, m=m: m.apply(v, a, b, iters=6))(
            variables, jnp.asarray(img1), jnp.asarray(img2))
    got = np.asarray(flows[-1])
    err = np.abs(got - want).max()
    mean_err = np.abs(got - want).mean()
    print(f"{label}: max |flow diff| = {err:.5f}, mean = {mean_err:.6f}",
          flush=True)
