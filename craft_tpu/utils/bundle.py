"""Python reader for the CTB1 submission bundle written by native/bundler
(the C++ reimplementation of the reference's third-party Sintel packer;
/root/reference/bundler/README_BUNDLER.txt:10-26).
"""

from __future__ import annotations

import lzma
import struct
from typing import Dict, List

import numpy as np


def read_bundle(path: str) -> Dict:
    with open(path, "rb") as f:
        raw = lzma.decompress(f.read())
    off = [0]

    def u32():
        (v,) = struct.unpack_from("<I", raw, off[0])
        off[0] += 4
        return v

    def f32s(n):
        v = np.frombuffer(raw, "<f4", count=n, offset=off[0]).copy()
        off[0] += 4 * n
        return v

    def s():
        n = u32()
        v = raw[off[0]:off[0] + n].decode()
        off[0] += n
        return v

    assert raw[:4] == b"CTB1", "not a CTB1 bundle"
    off[0] = 4
    version = u32()
    npass = u32()
    passes = []
    for _ in range(npass):
        nseq = u32()
        seqs = []
        for _ in range(nseq):
            name = s()
            nframes = u32()
            w, h = u32(), u32()
            canon = f32s(w * h * 2).reshape(h, w, 2)
            frames = []
            for _ in range(nframes):
                fname = s()
                fw, fh = u32(), u32()
                ns = u32()
                rec = np.frombuffer(raw, "<u4", count=ns * 3,
                                    offset=off[0]).copy()
                off[0] += 12 * ns
                rec = rec.reshape(ns, 3)
                idx = rec[:, 0]
                uv = rec[:, 1:].view("<f4")
                frames.append({"name": fname, "w": fw, "h": fh,
                               "indices": idx, "uv": uv})
            seqs.append({"name": name, "canonical": canon, "frames": frames})
        passes.append(seqs)
    return {"version": version, "passes": passes}
