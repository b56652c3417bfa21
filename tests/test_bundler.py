"""Build + roundtrip the native C++ Sintel bundler."""

import os
import subprocess

import numpy as np
import pytest

BUNDLER_DIR = os.path.join(os.path.dirname(__file__), "..", "native",
                           "bundler")


@pytest.fixture(scope="module")
def bundler_bin():
    binp = os.path.join(BUNDLER_DIR, "bundler")
    if not os.path.isfile(binp):
        r = subprocess.run(["make"], cwd=BUNDLER_DIR, capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"bundler build failed: {r.stderr.decode()[:200]}")
    return binp


def test_bundler_roundtrip(tmp_path, bundler_bin, rng):
    from craft_tpu.data.frame_utils import write_flo
    from craft_tpu.utils.bundle import read_bundle

    flows = {}
    for pas in ("clean", "final"):
        for seq in ("ambush_1", "wall"):
            d = tmp_path / pas / seq
            d.mkdir(parents=True)
            for i in (1, 2):
                flow = rng.randn(8, 10, 2).astype(np.float32)
                write_flo(str(d / f"frame{i:04d}.flo"), flow)
                flows[(pas, seq, i)] = flow

    out = str(tmp_path / "out.lzma")
    r = subprocess.run([bundler_bin, str(tmp_path / "clean"),
                        str(tmp_path / "final"), out, "4", "99"],
                       capture_output=True)
    assert r.returncode == 0, r.stderr.decode()

    bundle = read_bundle(out)
    assert len(bundle["passes"]) == 2
    for pi, pas in enumerate(("clean", "final")):
        seqs = bundle["passes"][pi]
        assert [s["name"] for s in seqs] == ["ambush_1", "wall"]
        for s in seqs:
            # Canonical = full first frame.
            np.testing.assert_array_equal(
                s["canonical"], flows[(pas, s["name"], 1)])
            for fi, fr in enumerate(s["frames"], start=1):
                full = flows[(pas, s["name"], fi)].reshape(-1, 2)
                np.testing.assert_array_equal(fr["uv"], full[fr["indices"]])

    # Determinism: same seed -> identical bundle bytes.
    out2 = str(tmp_path / "out2.lzma")
    subprocess.run([bundler_bin, str(tmp_path / "clean"),
                    str(tmp_path / "final"), out2, "4", "99"], check=True)
    assert open(out, "rb").read() == open(out2, "rb").read()
