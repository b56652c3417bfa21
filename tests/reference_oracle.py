"""Helpers to build the PyTorch reference models as numerical oracles.

The reference repo (read-only at /root/reference) is imported — never copied —
to generate golden outputs for parity tests.  Tests that need it are skipped
when the reference or torch is unavailable.
"""

import sys
import types
from argparse import Namespace

REFERENCE_ROOT = "/root/reference"


def _ensure_ref_path():
    p = f"{REFERENCE_ROOT}/core"
    if p not in sys.path:
        sys.path.insert(0, p)


def reference_available() -> bool:
    try:
        import torch  # noqa: F401
        _ensure_ref_path()
        import setrans  # noqa: F401
        return True
    except Exception:
        return False


def make_args(**overrides) -> Namespace:
    """Reference train.py CLI defaults (train.py:311-404)."""
    args = Namespace(
        craft=True, use_setrans=True, raft=False, nogma=False,
        corr_radius=4, dropout=0.0, mixed_precision=False,
        f1trans="none", f2trans="full",
        f2_pos_code_weight=0.5, f2_attn_mask_radius=-1,
        inter_num_modes=4, intra_num_modes=4, f2_num_modes=4,
        inter_qk_have_bias=True,
        inter_pos_code_type="bias", inter_pos_code_weight=0.5,
        intra_pos_code_type="bias", intra_pos_code_weight=1.0,
        pos_bias_radius=7, num_heads=1, corr_multiplier=1,
        position_only=False, position_and_content=False,
        upsample_learn=False,
    )
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def build_reference_model(arch: str = "craft", **arg_overrides):
    """Instantiate the torch reference model (eval mode, CPU)."""
    import torch
    _ensure_ref_path()
    torch.manual_seed(0)
    args = make_args(**arg_overrides)
    if arch == "raft":
        args.craft = False
        args.use_setrans = False
        args.f2trans = "none"
        from raft import RAFT
        model = RAFT(args)
    elif arch == "craft_nogma":
        args.use_setrans = False
        from craft_nogma import CRAFT_nogma
        model = CRAFT_nogma(args)
    else:
        from network import CRAFT
        model = CRAFT(args)
    model.eval()
    return model, args
