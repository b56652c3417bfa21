"""Layer-by-layer fnet parity debugging."""

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import torch
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from reference_oracle import build_reference_model
from craft_tpu.nn.layers import Conv, InstanceNorm
from craft_tpu.utils.torch_convert import convert_torch_state

ref, _ = build_reference_model("raft")
fnet_t = ref.fnet

rng = np.random.RandomState(0)
H, W = 64, 96
x = rng.uniform(-1, 1, (1, H, W, 3)).astype(np.float32)
tx = torch.from_numpy(x.transpose(0, 3, 1, 2))

with torch.no_grad():
    t = fnet_t.conv1(tx)
    t_n = fnet_t.norm1(t)
    t_r = torch.relu(t_n)
    t_l1 = fnet_t.layer1(t_r)
    t_l2 = fnet_t.layer2(t_l1)
    t_l3 = fnet_t.layer3(t_l2)

w = fnet_t.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
b = fnet_t.conv1.bias.detach().numpy()

conv = Conv(64, (7, 7), (2, 2))
cv = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
cv = {"params": {"Conv_0": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}}
j = conv.apply(cv, jnp.asarray(x))
print("conv1 diff:", np.abs(np.asarray(j) - t.numpy().transpose(0, 2, 3, 1)).max())

inorm = InstanceNorm()
jn = inorm.apply({}, j)
print("norm1 diff:", np.abs(np.asarray(jn) - t_n.numpy().transpose(0, 2, 3, 1)).max())

# full fnet vs mine
from craft_tpu.nn.encoder import BasicEncoder
state = {k[len("fnet."):]: v.detach().numpy() for k, v in ref.state_dict().items()
         if k.startswith("fnet.")}
fnet = BasicEncoder(output_dim=256, norm_fn="instance", train=False)
fv = fnet.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
fv, _ = convert_torch_state(state, fv, strict=True)

# Stage checks via capture intermediate: rerun stages manually
import flax.linen as nn
from craft_tpu.nn.encoder import ResidualBlock

params = fv["params"]
y = conv.apply({"params": {"Conv_0": params["conv1"]["Conv_0"]}}, jnp.asarray(x))
y = inorm.apply({}, y)
y = jax.nn.relu(y)
print("stem diff:", np.abs(np.asarray(y) - t_r.numpy().transpose(0, 2, 3, 1)).max())

for li, (dim, stride, t_out) in enumerate([(64, 1, t_l1), (96, 2, t_l2), (128, 2, t_l3)], start=1):
    for bi in range(2):
        blk = ResidualBlock(dim, "instance", stride if bi == 0 else 1, train=False)
        bp = params[f"layer{li}_{bi}"]
        y = blk.apply({"params": bp}, y)
    print(f"layer{li} diff:", np.abs(np.asarray(y) - t_out.numpy().transpose(0, 2, 3, 1)).max())
