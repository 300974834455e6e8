"""Aggregate an xplane TPU trace by op CATEGORY (attention kernels,
convolutions, copies, reduces, elementwise fusions, ...) — the table the
flat per-instruction dump from trace_step.summarize can't show.

Run: python tools_dev/trace_agg.py /tmp/jax_trace_train
"""
import glob
import os
import re
import sys


def category(name: str) -> str:
    n = name
    if n.startswith("%attn") or "custom-call" in n and "attn" in n:
        m = re.search(r"custom-call\(bf16\[(\d+),(\d+)", n)
        shape = f" BH{m.group(1)} S{m.group(2)}" if m else ""
        two_out = n.count("bf16[") >= 2 and n.split("=")[1].count("(") > 0
        kind = "bwd" if (", bf16[" in n.split("custom-call")[0] or
                         "(bf16" in n.split("=")[1].split("custom-call")[0]
                         and "f32[" not in n.split("custom-call")[0]) else "fwd"
        del two_out
        return f"pallas-attn {kind}{shape}"
    if "convolution" in n:
        return "convolution(+fused add)"
    if n.startswith("%copy-start") or n.startswith("%copy-done") or \
            n.startswith("%copy"):
        return "copy (layout/HBM spill)"
    if "reduce_window" in n:
        return "reduce_window"
    if "convert_reduce" in n or n.startswith("%reduce") or "_reduce_" in n:
        return "reduce (GN stats / grads-sum)"
    if "all-reduce" in n:
        return "all-reduce"
    if n.startswith("%fusion") or "_fusion" in n:
        return "elementwise/other fusion"
    if n.startswith("%dot") or "dot_general" in n:
        return "dot (matmul)"
    if n.startswith("%bitcast") or n.startswith("%transpose"):
        return "bitcast/transpose"
    if n.startswith("jit_") or n in ("0", "1", "2"):
        return None  # program-level rows, not self-time
    return "other"


def main(outdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert files, f"no xplane under {outdir}"
    path = max(files, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        print(f"== plane: {plane.name}")
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        # lines nest (module > ops); aggregate each line separately and
        # report the per-op line (the one with the most events)
        best = None
        for line in plane.lines:
            totals, counts = {}, {}
            n_ev = 0
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                cat = category(name)
                n_ev += 1
                if cat is None:
                    continue
                totals[cat] = totals.get(cat, 0.0) + ev.duration_ps / 1e9
                counts[cat] = counts.get(cat, 0) + 1
            if totals and (best is None or n_ev > best[0]):
                best = (n_ev, line.name, totals, counts)
        n_ev, lname, totals, counts = best
        tot = sum(totals.values())
        print(f"  line {lname!r}: {n_ev} events, categorized self-time "
              f"{tot:.0f} ms")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1]):
            print(f"  {ms:9.1f} ms {100 * ms / tot:5.1f}%  x{counts[name]:<5d}"
                  f" {name}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_train")
