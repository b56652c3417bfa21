"""PyTorch checkpoint -> flax variables converter.

Handles the reference checkpoint zoo (craft-{chairs,things,sintel,kitti}.pth and
RAFT/GMA variants): DataParallel ``module.`` prefixes, the legacy bare-state-dict
format and the new ``{'model': ...}`` format (reference train.py:132-155),
tied Q/K weights that appear twice in the state dict (setrans.py:475-478; the
duplicate ``key.*`` entries are ignored — ``query.*`` is authoritative), and
BatchNorm running stats -> flax batch_stats.

Weight layout transforms:
  torch Conv2d [O, I, kh, kw]   -> flax kernel [kh, kw, I, O]
  torch Linear [O, I]           -> flax kernel [I, O]
  torch Conv1d grouped [M*F, F, 1] (MMPrivateOutput) -> [M, F, F] einsum kernel
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

from craft_tpu.config import ModelConfig


def strip_prefixes(state: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Unwrap {'model': ...} and strip DataParallel 'module.' prefixes."""
    if "model" in state and isinstance(state["model"], Mapping):
        state = state["model"]
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v
    return out


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file into numpy (torch CPU required only here)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    raw = strip_prefixes(raw)
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in raw.items() if hasattr(v, "shape")}


_GRU_MAP = {"convz_h": "convz1", "convr_h": "convr1", "convq_h": "convq1",
            "convz_v": "convz2", "convr_v": "convr2", "convq_v": "convq2"}


def _flax_path_to_torch(col: str, path: Tuple[str, ...]) -> Tuple[str, str]:
    """Map a flax variable path to (torch key, transform tag)."""
    toks = [t for t in path if t not in ("Conv_0", "Dense_0")]
    leaf = toks[-1]
    toks = toks[:-1]

    out = []
    i = 0
    while i < len(toks):
        t = toks[i]
        m = re.fullmatch(r"layer(\d)_(\d)", t)
        if m:
            out.append(f"layer{m.group(1)}.{m.group(2)}")
        elif t.startswith("BatchNorm_") or t.startswith("GroupNorm_"):
            idx = int(t.split("_")[1])
            in_block = any(x.startswith("layer") for x in out)
            if not in_block:
                out.append("norm1")  # encoder stem norm
            elif idx == 0:
                out.append("norm1")
            elif idx == 1:
                out.append("norm2")
            else:
                out.append("downsample.1")
        elif t in _GRU_MAP and out and out[-1] == "gru":
            out.append(_GRU_MAP[t])
        elif t == "conv1" and out and out[-1] == "mask":
            out[-1] = "mask.0"
        elif t == "conv2" and out and out[-1] == "mask":
            out[-1] = "mask.2"
        elif t == "downsample":
            out.append("downsample.0")
        else:
            out.append(t)
        i += 1

    # Leaf name + transform.
    if col == "batch_stats":
        torch_leaf = {"mean": "running_mean", "var": "running_var"}[leaf]
        tag = "copy"
    elif leaf == "kernel":
        torch_leaf, tag = "weight", "kernel"
    elif leaf == "scale":
        torch_leaf, tag = "weight", "copy"
    elif leaf in ("bias", "biases", "gamma", "input_skip_coeff"):
        torch_leaf, tag = leaf, "copy"
    elif leaf in ("rel_height", "rel_width"):
        torch_leaf, tag = leaf + ".weight", "copy"
    elif leaf == "output_kernel":
        torch_leaf, tag = "group_linear.weight", "group_conv1d"
    elif leaf == "output_bias":
        torch_leaf, tag = "group_linear.bias", "group_bias"
    else:
        torch_leaf, tag = leaf, "copy"

    if torch_leaf in ("biases", "gamma", "input_skip_coeff"):
        key = ".".join(out + [torch_leaf])
    elif "." in torch_leaf and torch_leaf.endswith(".weight"):
        key = ".".join(out + [torch_leaf])
    else:
        key = ".".join(out + [torch_leaf]) if out else torch_leaf
    return key, tag


def _apply_transform(value: np.ndarray, tag: str, target_shape) -> np.ndarray:
    if tag == "kernel":
        if value.ndim == 4:  # conv OIHW -> HWIO
            value = value.transpose(2, 3, 1, 0)
        elif value.ndim == 2:  # linear [O, I] -> [I, O]
            value = value.T
        elif value.ndim == 3:  # conv1d [O, I, k] -> [k, I, O]
            value = value.transpose(2, 1, 0)
    elif tag == "group_conv1d":
        # [M*F, F, 1] -> [M, F(in), F(out)]
        MF, F, _ = value.shape
        M = MF // F
        value = value[:, :, 0].reshape(M, F, F).transpose(0, 2, 1)
    elif tag == "group_bias":
        F = target_shape[-1]
        value = value.reshape(-1, F)
    if tuple(value.shape) != tuple(target_shape):
        raise ValueError(
            f"shape mismatch after transform: {value.shape} vs {target_shape}")
    return value


def convert_torch_state(torch_state: Mapping[str, np.ndarray],
                        variables, strict: bool = True):
    """Fill a flax variable tree (from model.init) with torch weights.

    Returns (new_variables, report) where report lists unmatched torch keys.
    """
    used = set()
    new_vars = {}
    missing = []
    for col, tree in variables.items():
        if col not in ("params", "batch_stats"):
            # Non-weight collections (diagnostics/intermediates sow targets)
            # pass through untouched.
            new_vars[col] = tree
            continue
        flat = flatten_dict(tree)
        new_flat = {}
        for path, leaf in flat.items():
            key, tag = _flax_path_to_torch(col, path)
            if key in torch_state:
                new_flat[path] = np.asarray(
                    _apply_transform(np.asarray(torch_state[key]), tag,
                                     leaf.shape), dtype=np.float32)
                used.add(key)
            else:
                missing.append((col, "/".join(path), key))
                new_flat[path] = leaf
        new_vars[col] = unflatten_dict(new_flat)

    unused = [k for k in torch_state
              if k not in used
              and not k.endswith("num_batches_tracked")
              # tied K duplicates query.* (setrans.py:475-478)
              and not re.search(r"setrans\.key\.(weight|bias)$", k)]
    if strict and missing:
        detail = "\n".join(f"  {c} {p} <- {k}" for c, p, k in missing[:20])
        raise KeyError(f"{len(missing)} flax leaves unmatched:\n{detail}")
    return new_vars, {"missing": missing, "unused_torch_keys": unused}


def convert_checkpoint(path: str, cfg: ModelConfig, variables,
                       strict: bool = True):
    """One-shot: load .pth and convert into `variables` from model.init."""
    return convert_torch_state(load_torch_state(path), variables, strict=strict)
