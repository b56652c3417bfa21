"""Compiled-kernel verification on real TPU: full CRAFT forward with the
Pallas fast paths (auto-enabled on TPU) vs the torch reference oracle.

The pallas kernels are unit-tested in interpret mode on CPU; this checks the
actual Mosaic-compiled kernels end-to-end, matching the reference protocol of
validating released checkpoints (evaluate.py:1523-1557) as closely as this
environment allows.

Oracle caching: with --npz PATH, the torch oracle's inputs/weights/output are
loaded from PATH when it exists (no torch needed — usable on a bare TPU
host), and built + saved there when it doesn't (requires torch +
/root/reference).

--assert exits nonzero unless the per-config bounds below hold, making this
runnable as a hardware CI gate (tests/test_tpu_golden.py).
"""

import argparse
import contextlib
import dataclasses
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np

# Measured on the bench chip (12 refinement iters, 128x128 random-noise
# inputs, vs the torch fp32 oracle): highest-precision fp32 7e-5 px;
# default precision (fp32 arrays lowered to bf16 MXU passes) and
# mixed-bf16 0.096-0.109 px (noise inputs don't converge, so bf16 drift
# accumulates across iterations — real-image production bound is 0.05 px
# at 440x1024, tests/test_golden_fullsize.py).  A broken kernel is
# pixels-to-hundreds off, so these bounds still gate regressions hard.
FULLPREC_BOUND_PX = 1e-3   # jax.default_matmul_precision("highest")
BF16_BOUND_PX = 0.15       # bf16 MXU matmuls (default precision / mixed)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict) or hasattr(v, "items"):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def build_or_load_oracle(npz_path=None):
    """Returns (img1, img2, want, variables_tree).  want is the reference
    model's iters=12 upsampled flow in NHWC."""
    if npz_path and os.path.exists(npz_path):
        data = dict(np.load(npz_path))
        img1, img2, want = data.pop("__img1"), data.pop("__img2"), \
            data.pop("__want")
        return img1, img2, want, _unflatten(data)

    import torch

    from craft_tpu.config import craft_config
    from craft_tpu.models.flow_model import FlowModel
    from craft_tpu.utils.torch_convert import convert_torch_state
    from reference_oracle import build_reference_model

    import jax
    import jax.numpy as jnp

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

    with torch.no_grad():
        t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
        t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2))
        _, ref_up = ref(t1, t2, iters=12, test_mode=1)
    want = ref_up.numpy().transpose(0, 2, 3, 1)

    variables = jax.tree.map(np.asarray, jax.device_get(
        getattr(variables, "unfreeze", lambda: variables)()))
    if npz_path:
        flat = _flatten(variables)
        assert not any(k.startswith("__") for k in flat)
        np.savez(npz_path, __img1=img1, __img2=img2, __want=want, **flat)
        print(f"oracle snapshot saved: {npz_path}")
    return img1, img2, want, variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default=None,
                    help="oracle snapshot cache (load if exists, else "
                         "build from torch + save)")
    ap.add_argument("--assert", dest="do_assert", action="store_true",
                    help="exit nonzero unless golden bounds hold")
    args = ap.parse_args()

    from craft_tpu.utils.jax_setup import setup_jax
    jax = setup_jax()
    import jax.numpy as jnp

    from craft_tpu.config import craft_config
    from craft_tpu.models.flow_model import FlowModel

    print("backend:", jax.default_backend())
    img1, img2, want, variables = build_or_load_oracle(args.npz)
    cfg = craft_config(mixed_precision=False)

    # Only the "highest" matmul-precision run is fullprec on TPU: default
    # precision lowers fp32 matmuls onto bf16 MXU passes, so those runs are
    # bf16-class numerically.
    bounds = {"pallas-highest": FULLPREC_BOUND_PX,
              "pallas": BF16_BOUND_PX,
              "mixed-bf16": BF16_BOUND_PX,
              "xla-only": BF16_BOUND_PX}
    failures = []
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
                lambda v, a, b, m=m: m.apply(v, a, b, iters=12))(
                variables, jnp.asarray(img1), jnp.asarray(img2))
        got = np.asarray(flows[-1])
        err = np.abs(got - want).max()
        mean_err = np.abs(got - want).mean()
        ok = err <= bounds[label]
        print(f"{label}: max |flow diff| = {err:.5f}, mean = {mean_err:.6f}"
              f" (bound {bounds[label]}) {'OK' if ok else 'FAIL'}",
              flush=True)
        if not ok:
            failures.append((label, err))

    if args.do_assert and failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("verify_tpu: all bounds hold" if not failures else
          "verify_tpu: bounds violated (no --assert)")


if __name__ == "__main__":
    main()
