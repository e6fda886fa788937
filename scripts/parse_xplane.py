"""
Parse a jax.profiler xplane.pb trace without tensorflow/tensorboard deps
(the image's tensorboard_plugin_profile protos are unimportable), using a
minimal protobuf wire-format reader. Prints per-op and per-category device
time for the TPU plane.

Usage:
  with jax.profiler.trace("/tmp/trace"): fn(...)   # then
  python scripts/parse_xplane.py /tmp/trace

Field numbers follow tsl/profiler/protobuf/xplane.proto:
  XSpace.planes=1; XPlane{name=2, lines=3, event_metadata=4};
  XLine{name=2, events=4}; XEvent{metadata_id=1, duration_ps=3};
  XEventMetadata{id=1, name=2}.
"""

from __future__ import annotations

import glob
import re
import sys
from collections import Counter


def _varint(buf: bytes, i: int):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf: bytes):
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wiretype {wt}")
        yield fn, wt, v


def tpu_op_durations(trace_dir: str):
    """Return {op_hlo_text: duration_ps} for the 'XLA Ops' line of the first
    TPU device plane found under trace_dir."""
    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    buf = open(paths[0], "rb").read()
    tpu = None
    for fn, _, v in _fields(buf):
        if fn == 1 and b"/device:TPU" in v[:48]:
            tpu = v
            break
    if tpu is None:
        raise RuntimeError("no TPU plane in trace")
    emeta = {}
    for f, _, v in _fields(tpu):
        if f == 4:  # event_metadata map entry {key=1, value=2}
            md = None
            for f2, _, v2 in _fields(v):
                if f2 == 2:
                    md = v2
            if md is None:
                continue
            mid, mname = None, ""
            for f3, _, v3 in _fields(md):
                if f3 == 1:
                    mid = v3
                elif f3 == 2:
                    mname = v3.decode(errors="replace")
            if mid is not None:
                emeta[mid] = mname
    agg: Counter = Counter()
    for f, _, line in _fields(tpu):
        if f != 3:
            continue
        lname, events = "", []
        for f2, w2, v2 in _fields(line):
            if f2 == 2:
                lname = v2.decode(errors="replace")
            elif f2 == 4 and w2 == 2:
                events.append(v2)
        if lname != "XLA Ops":
            continue
        for ev in events:
            mid = dur = 0
            for f3, _, v3 in _fields(ev):
                if f3 == 1:
                    mid = v3
                elif f3 == 3:
                    dur = v3
            agg[emeta.get(mid, "?")] += dur
    return agg


def categorize(name: str) -> str:
    if name.startswith("%convert_reduce_fusion"):
        return "norm stats pass (separate activation read)"
    if "convolution" in name:
        return "convolution (+fused epilogue)"
    if name.startswith("%fusion"):
        return "other fusions (elementwise/norm apply/resample/attention)"
    if "copy" in name or "bitcast" in name:
        return "copies/layout"
    return "misc"


def main() -> None:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace"
    agg = tpu_op_durations(trace_dir)
    total = sum(agg.values())
    print(f"device total {total/1e9:.2f} ms over {len(agg)} distinct ops")
    print("\ntop ops:")
    for k, v in agg.most_common(20):
        print(f"  {v/1e9:8.3f} ms  {100*v/total:5.1f}%  {k[:100]}")
    cats: Counter = Counter()
    for k, v in agg.items():
        cats[categorize(k)] += v
    print("\nby category:")
    for k, v in cats.most_common():
        print(f"  {v/1e9:8.2f} ms  {100*v/total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
