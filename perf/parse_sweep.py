"""Parse a r3_sweep*.log into a compact table: leg name -> headline metric.

Each leg is logged as `=== name : env ...` followed by bench.py's tail, whose
last line is the single JSON record. Legs that crashed (VMEM OOM, tunnel
stall) have no JSON line and are reported as FAILED with the last line seen.

Usage: python perf/parse_sweep.py [perf/r3_sweep4.log]
"""
import json
import re
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "perf/r3_sweep4.log"
legs = []  # (name, lines)
name = None
lines: list = []
for raw in open(path, errors="replace"):
    m = re.match(r"^=== (\S+)", raw)
    if m:
        if name is not None:
            legs.append((name, lines))
        name, lines = m.group(1), []
    elif name is not None:
        lines.append(raw.rstrip())
if name is not None:
    legs.append((name, lines))

for name, lines in legs:
    rec = None
    for ln in reversed(lines):
        if ln.startswith("{"):
            try:
                rec = json.loads(ln)
                break
            except json.JSONDecodeError:
                continue
    if rec is None:
        tail = lines[-1][:100] if lines else "(no output)"
        print(f"{name:32s} FAILED  {tail}")
    else:
        extras = {
            k: v for k, v in rec.items()
            if k not in ("metric", "value", "unit", "vs_baseline")
        }
        print(
            f"{name:32s} {rec.get('value'):>10} {rec.get('unit', ''):24s}"
            f" vs_baseline={rec.get('vs_baseline')}"
            + (f"  {extras}" if extras else "")
        )
