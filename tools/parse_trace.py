"""Minimal xplane.pb parser: per-XLA-op-family self-time from a
jax.profiler trace, with no tensorboard/tbp dependency (raw protobuf
varint walk).  Importable (`top_op_families`) — bench.py --profile uses it
to print the top self-time table next to every perf number — or a CLI:

    python tools/parse_trace.py <trace_dir> [n_runs] [top_k]
"""
import collections
import glob
import sys


def read_varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7f) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def parse_fields(buf):
    i = 0
    out = collections.defaultdict(list)
    while i < len(buf):
        key, i = read_varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = read_varint(buf, i)
        elif wt == 2:
            ln, i = read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(wt)
        out[fn].append(v)
    return out


def top_op_families(trace_dir: str, n_runs: int = 1, device_substr="TPU"):
    """Aggregate XLA-op self-time by op family from the newest xplane.pb
    under `trace_dir`.  Returns [(family_name, ms_per_run), ...] sorted by
    descending self-time."""
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    data = open(paths[-1], "rb").read()
    space = parse_fields(data)
    tot = collections.Counter()
    for plane_b in space[1]:
        plane = parse_fields(plane_b)
        name = plane[2][0].decode() if plane[2] else ""
        if device_substr not in name:
            continue
        meta = {}
        for m in plane[4]:
            mf = parse_fields(m)
            vm = parse_fields(mf[2][0])
            meta[mf[1][0]] = vm[2][0].decode() if 2 in vm and vm[2] else ""
        for line_b in plane[3]:
            line = parse_fields(line_b)
            lname = line[2][0].decode() if 2 in line and line[2] else ""
            if lname != "XLA Ops":
                continue
            for ev_b in line[4]:
                ev = parse_fields(ev_b)
                dur = ev[3][0] if 3 in ev else 0
                nm = meta.get(ev[1][0] if 1 in ev else None, "?")
                base = nm.split(".")[0].rstrip("0123456789")
                tot[base] += dur
    return [(nm, ps / 1e9 / n_runs) for nm, ps in tot.most_common()]


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ti"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    top_k = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    fams = top_op_families(trace_dir, n)
    print(f"XLA op families, ms per run ({trace_dir}):")
    for nm, ms in fams[:top_k]:
        print(f"{ms:9.3f} ms  {nm[:80]}")


if __name__ == "__main__":
    main()
