"""Group a captured xplane trace's leaf XLA ops by name family.

Usage: python scripts/trace_groups.py [/tmp/jax_trace]

The 'XLA Ops' line nests while-loop wrapper events over their body ops, so
wrapper entries (while.*, conditional.*) are excluded; the remaining leaf
ops sum to the module wall time. Families are the op-name prefix before the
trailing .N id, bucketed further by output shape so e.g. the (5605,3)
layout copies separate from big-store copies.
"""
import glob
import re
import sys
from collections import defaultdict


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert xplanes, f"no xplane under {logdir}"
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplanes[0], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            tot = defaultdict(float)
            cnt = defaultdict(int)
            leaf_total = 0.0
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                base = name.lstrip("%").split(" ")[0]
                fam = re.sub(r"\.\d+$", "", base)
                if fam in ("while", "conditional", "call"):
                    continue
                shape = ""
                m = re.search(r"= (\(?\w+\[[\d,]*\])", name)
                if m:
                    shape = m.group(1)
                key = f"{fam} {shape}"
                d = ev.duration_ps / 1e9
                tot[key] += d
                cnt[key] += 1
                leaf_total += d
            print(f"leaf total {leaf_total:.1f} ms ({len(line.events)} events)")
            items = sorted(tot.items(), key=lambda kv: -kv[1])
            for name, t in items[:60]:
                print(f"{t:10.2f} ms  x{cnt[name]:<6} {name}")
            # coarse rollup by family only
            fam_tot = defaultdict(float)
            for k, v in tot.items():
                fam_tot[k.split(" ")[0]] += v
            print("\n-- family rollup --")
            for name, t in sorted(fam_tot.items(), key=lambda kv: -kv[1])[:25]:
                print(f"{t:10.2f} ms  {name}")


if __name__ == "__main__":
    main()
