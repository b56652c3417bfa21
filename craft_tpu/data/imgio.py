"""Native image decode front-end (the reference's PIL/libpng decode path,
done through the C++ core in native/imgio without the PIL object layer).

`load(path)` returns the same arrays `np.array(PIL.Image.open(path))`
produces: uint8 [H, W, 3] / [H, W] for RGB/gray, uint16 where the file is
16-bit (KITTI flow PNGs).  Falls back to PIL when the extension is not
built; `build()` compiles it in place (also done by tests/test_imgio.py).
"""

from __future__ import annotations

import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..",
                    "native", "imgio")
_mod = None
_tried = False


def build(quiet: bool = True) -> bool:
    """Compile the extension in native/imgio; returns success."""
    r = subprocess.run(["make"], cwd=_DIR, capture_output=True)
    if r.returncode != 0 and not quiet:
        raise RuntimeError(f"craft_imgio build failed: {r.stderr.decode()}")
    return r.returncode == 0


def _get():
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    import importlib.util
    import sysconfig

    so = os.path.join(_DIR, "craft_imgio"
                      + sysconfig.get_config_var("EXT_SUFFIX"))
    if not os.path.isfile(so):
        return None
    spec = importlib.util.spec_from_file_location("craft_imgio", so)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception:
        return None
    _mod = mod
    return _mod


def available() -> bool:
    return _get() is not None


def load(path: str) -> np.ndarray:
    """Decode PNG/JPEG/PPM/PGM to a numpy array (native core, PIL fallback)."""
    mod = _get()
    if mod is not None:
        with open(path, "rb") as f:
            raw = f.read()
        try:
            data, h, w, c, bps = mod.decode(raw)
        except ValueError:
            mod = None  # unknown format -> PIL below
        else:
            dt = np.uint16 if bps == 2 else np.uint8
            arr = np.frombuffer(data, dt)
            return arr.reshape(h, w) if c == 1 else arr.reshape(h, w, c)
    from PIL import Image

    return np.array(Image.open(path))
