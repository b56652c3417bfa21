"""Dump the compiled HLO of the headline bench forward and summarize the
`copy` / `transpose` / `bitcast-convert` ops XLA inserted (layout
assignment artifacts — the %copy family was 7.75 ms of a ~43 ms forward in
the round-4 trace).  Groups by shape so the biggest relayout targets are
obvious.

    python tools/dump_copies.py [--save /tmp/bench_fwd.hlo]
"""
import re
import sys
import os
import collections

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from craft_tpu.utils.jax_setup import setup_jax
    jax = setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from craft_tpu.config import craft_config
    from craft_tpu.models.flow_model import FlowModel
    from craft_tpu.ops.geometry import InputPadder

    cfg = craft_config(mixed_precision=True)
    model = FlowModel(cfg=cfg, train=False)

    H, W = 436, 1024
    rng = np.random.RandomState(0)
    img1 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    padder = InputPadder((1, H, W, 3), mode="sintel")
    jimg1, jimg2 = padder.pad(jnp.asarray(img1), jnp.asarray(img2))

    init_sized = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), init_sized, init_sized,
                           iters=1)

    def forward(variables, a, b):
        lowres, flows = model.apply(variables, a, b, iters=12)
        return flows[-1]

    compiled = jax.jit(forward).lower(variables, jimg1, jimg2).compile()
    txt = compiled.as_text()
    if "--save" in sys.argv:
        path = sys.argv[sys.argv.index("--save") + 1]
        with open(path, "w") as f:
            f.write(txt)
        print(f"# saved {len(txt)} bytes to {path}")

    # f32[1,55,128,256]{3,2,1,0} copy(...)  — collect op kind + result shape.
    pat = re.compile(r"^\s*(?:ROOT )?%?([\w.-]+) = (\S+?) (copy|transpose|"
                     r"bitcast-convert)\((.*)$", re.M)
    by_shape = collections.Counter()
    examples = {}
    for m in pat.finditer(txt):
        name, shape, kind, rest = m.groups()
        key = (kind, shape)
        by_shape[key] += 1
        examples.setdefault(key, name)

    def nbytes(shape):
        m2 = re.match(r"(bf16|f32|f16|s32|s8|u8|pred|s16|u32)\[([\d,]*)\]",
                      shape)
        if not m2:
            return 0
        dt, dims = m2.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4,
                    "s16": 2, "s8": 1, "u8": 1, "pred": 1}[dt]

    rows = sorted(by_shape.items(), key=lambda kv: -nbytes(kv[0][1]) * kv[1])
    total = 0
    print(f"{'kind':<16} {'count':>5} {'MB total':>9}  shape  (example op)")
    for (kind, shape), cnt in rows[:40]:
        mb = nbytes(shape) * cnt / 1e6
        total += mb
        print(f"{kind:<16} {cnt:>5} {mb:>9.2f}  {shape}  ({examples[(kind, shape)]})")
    print(f"# total bytes moved by listed ops: {total:.1f} MB "
          f"(x2 for read+write)")


if __name__ == "__main__":
    main()
