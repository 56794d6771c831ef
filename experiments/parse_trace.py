import glob, json
from xprof.convert import raw_to_tool_data as rtd
f = glob.glob("/tmp/tb/**/*.xplane.pb", recursive=True)
data, _ = rtd.xspace_to_tool_data(f, "framework_op_stats", {})
js = json.loads(data) if isinstance(data,(str,bytes)) else data
tbl = js[0]
cols = [c["id"] for c in tbl["cols"]]
rows = [dict(zip(cols,[c["v"] for c in r["c"]])) for r in tbl["rows"]]
dev = [r for r in rows if r["host_or_device"]=="Device"]
dev.sort(key=lambda r:-r["total_self_time"])
tot = sum(r["total_self_time"] for r in dev)
print(f"total device self time: {tot:.0f} us over 20 steps -> {tot/20:.0f} us/step")
for r in dev[:28]:
    print(f"{r['total_self_time']/20:8.1f} us/step {100*r['total_self_time']/tot:5.1f}%  {r['occurrences']:4.0f}x  {r['operation'][:90]}")
