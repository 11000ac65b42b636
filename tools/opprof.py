"""Print top self-time ops from an xplane trace (xprof converter)."""
import sys, glob, json
from xprof.convert import raw_to_tool_data as rtd

xplane = sorted(glob.glob(sys.argv[1] + "/**/*.xplane.pb", recursive=True))[-1]
data, _ = rtd.xspace_to_tool_data([xplane], "framework_op_stats", {})
text = data.decode() if isinstance(data, bytes) else data
tbl = json.loads(text)[0]
cols = [c["id"] for c in tbl["cols"]]
rows = []
for r in tbl["rows"]:
    d = dict(zip(cols, [c["v"] for c in r["c"]]))
    if d["host_or_device"] != "Device":
        continue
    rows.append(d)
rows.sort(key=lambda d: -d["total_self_time"])
total = sum(d["total_self_time"] for d in rows)
print(f"total device self time: {total/1e3:.2f} ms (over all runs)")
print(f"{'op':<58} {'n':>4} {'tot_us':>9} {'avg_us':>7} {'%':>5} {'bound':>8} {'GB/s':>6} {'GF/s':>8}")
for d in rows[:35]:
    name = d["operation"].replace("jit(scan28)/while/body/closed_call/", "")
    print(f"{name[:58]:<58} {d['occurrences']:>4.0f} {d['total_self_time']:>9.0f} "
          f"{d['avg_self_time']:>7.1f} {100*d['total_self_time']/total:>5.1f} "
          f"{d['bound_by']:>8} {d['measured_memory_bw']:>6.0f} {d['model_flop_rate']:>8.0f}")
