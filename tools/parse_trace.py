import collections, glob, sys

def read_varint(buf, i):
    shift = 0; val = 0
    while True:
        b = buf[i]; i += 1
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
            v = buf[i:i+ln]; i += ln
        elif wt == 5:
            v = buf[i:i+4]; i += 4
        elif wt == 1:
            v = buf[i:i+8]; i += 8
        else:
            raise ValueError(wt)
        out[fn].append(v)
    return out

path = sorted(glob.glob("/tmp/ti/plugins/profile/*/vm.xplane.pb"))[-1]
data = open(path, "rb").read()
space = parse_fields(data)
tot = collections.Counter()
for plane_b in space[1]:
    plane = parse_fields(plane_b)
    name = plane[2][0].decode() if plane[2] else ""
    if name != "/device:TPU:0":
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
print(f"XLA op families, ms per run ({path}):")
n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
for nm, ps in tot.most_common(20):
    print(f"{ps/1e9/n:9.3f} ms  {nm[:80]}")
