"""Stage-by-stage parity debugging between torch reference and craft_tpu."""

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import torch
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from reference_oracle import build_reference_model
from craft_tpu.config import raft_config
from craft_tpu.models.flow_model import FlowModel
from craft_tpu.utils.torch_convert import convert_torch_state
from craft_tpu.nn.encoder import BasicEncoder
from craft_tpu.ops.corr import plain_corr_pyramid, corr_lookup
from craft_tpu.ops.geometry import coords_grid

ref, _ = build_reference_model("raft")
state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

rng = np.random.RandomState(0)
H, W = 64, 96
img1 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
img2 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2))

n1 = 2 * (t1 / 255.0) - 1.0
n2 = 2 * (t2 / 255.0) - 1.0

with torch.no_grad():
    tf1, tf2 = ref.fnet([n1, n2])
    tc = ref.cnet(n1)

# flax fnet standalone
fnet = BasicEncoder(output_dim=256, norm_fn="instance", dtype=jnp.float32, train=False)
fvars = fnet.init(jax.random.PRNGKey(0), jnp.zeros((2, H, W, 3)))
fstate = {k[len("fnet."):]: v for k, v in state.items() if k.startswith("fnet.")}
fvars, rep = convert_torch_state(fstate, fvars, strict=True)
jin = jnp.concatenate([jnp.asarray(2*(img1/255.)-1.), jnp.asarray(2*(img2/255.)-1.)], axis=0)
jf = fnet.apply(fvars, jin)
jf1, jf2 = np.asarray(jf[:1]), np.asarray(jf[1:])
print("fnet diff:", np.abs(jf1 - tf1.numpy().transpose(0,2,3,1)).max(),
      "nan?", np.isnan(jf1).any())

cnet = BasicEncoder(output_dim=256, norm_fn="batch", dtype=jnp.float32, train=False)
cvars = cnet.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
cstate = {k[len("cnet."):]: v for k, v in state.items() if k.startswith("cnet.")}
cvars, rep = convert_torch_state(cstate, cvars, strict=True)
jc = np.asarray(cnet.apply(cvars, jnp.asarray(2*(img1/255.)-1.)))
print("cnet diff:", np.abs(jc - tc.numpy().transpose(0,2,3,1)).max(),
      "nan?", np.isnan(jc).any())

# correlation pyramid + lookup
sys.path.insert(0, "/root/reference/core")
from corr import CorrBlock
tcorr = CorrBlock(tf1, tf2, radius=4)
pyr = plain_corr_pyramid(jnp.asarray(tf1.numpy().transpose(0,2,3,1)),
                         jnp.asarray(tf2.numpy().transpose(0,2,3,1)))
for i, lvl in enumerate(pyr.levels):
    tl = tcorr.corr_pyramid[i].numpy()  # [BU1, 1, h, w]
    jl = np.asarray(lvl).transpose(0, 3, 1, 2)
    print(f"pyr level {i} diff:", np.abs(jl - tl).max(), "nan?", np.isnan(jl).any())

coords = coords_grid(1, H//8, W//8) + 0.3
tcoords = torch.from_numpy(np.asarray(coords).transpose(0, 3, 1, 2))
tlook = tcorr(tcoords).numpy().transpose(0, 2, 3, 1)
jlook = np.asarray(corr_lookup(pyr, coords))
print("lookup diff:", np.abs(jlook - tlook).max(), "nan?", np.isnan(jlook).any())
