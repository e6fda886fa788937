"""
Join jax.profiler xplane durations with optimized-HLO metadata for true
per-category attribution.

parse_xplane.py alone sees only fusion NAMES; XLA names a conv that carries a
fused reduce epilogue "convert_reduce_fusion", which round 1 miscategorized
as a standalone GroupNorm statistics pass (BENCHMARKS.md op profile,
corrected this round). Joining against the compiled module's metadata
(op_name / source line per fusion) attributes each fusion to the op that
actually dominates it.

Usage:
  1. dump HLO:   jit(fn).lower(...).compile().as_text() -> hlo.txt
  2. trace:      with jax.profiler.trace(dir): fn(...)
  3. python scripts/attribute_profile.py <trace_dir> <hlo.txt>
"""
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from scripts.parse_xplane import tpu_op_durations

# build: fusion name -> (op_name metadata, source line, output shape)
TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_fwd"
HLO_PATH = sys.argv[2] if len(sys.argv) > 2 else "/tmp/exp/fwd_hlo.txt"
meta = {}
hlo = open(HLO_PATH).read()
for m in re.finditer(r"%(\S+?) = ([^\n]*?)fusion\([^\n]*?metadata=\{op_name=\"([^\"]*)\"(?: source_file=\"([^\"]*)\" source_line=(\d+))?", hlo):
    name, shape, op, sf, sl = m.groups()
    meta[name] = (op, (sf or "").split("/")[-1], sl or "", shape[:60])
for m in re.finditer(r"%(\S+?) = ([^\n]*?)(convolution|copy|reduce)\([^\n]*?metadata=\{op_name=\"([^\"]*)\"(?: source_file=\"([^\"]*)\" source_line=(\d+))?", hlo):
    name, shape, kind, op, sf, sl = m.groups()
    meta.setdefault(name, (op, (sf or "").split("/")[-1], sl or "", shape[:60]))

agg = tpu_op_durations(TRACE_DIR)
rows = []
for opname, dur_ps in agg.items():
    base = opname.strip("%").split(" ")[0].split("=")[0].strip().strip("%")
    info = meta.get(base)
    rows.append((dur_ps, base, info))
rows.sort(reverse=True)
total = sum(r[0] for r in rows)
print(f"total {total/1e9/3:.1f} ms/fwd")
cat = {}
for dur, base, info in rows:
    key = "???"
    if info:
        op = info[0]
        src = f"{info[1]}:{info[2]}"
        if "conv_general" in op:
            key = "conv(+epilogues)"
        elif "dot_general" in op:
            key = "matmul"
        elif any(s in op for s in ("reduce", "sub", "max", "exp", "div")) and "attention" in info[1]:
            key = "attention-softmax"
        elif "norm" in info[1]:
            key = "groupnorm:" + info[2]
        else:
            key = f"other:{src}"
    cat[key] = cat.get(key, 0) + dur
for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:18]:
    print(f"{v/1e9/3:8.2f} ms/fwd {100*v/total:5.1f}%  {k}")
print()
for dur, base, info in rows[:18]:
    print(f"{dur/1e9/3:8.2f} ms/fwd {base[:40]:42s} {info}")
