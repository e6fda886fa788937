"""Reconcile the conv-MXU attribution (VERDICT r4 weak #2).

Two prior measurements of the flagship's dominant conv family disagree:

- round-2 in-model profile (scripts/attribute_profile.py join): "the big 256²
  convs run at ~90% MXU" — basis for retiring exact-path perf work.
- round-4 standalone probe (scripts/bench_int8_conv.py): B32 128→128 @256²
  bf16 takes 6.040 ms = 52.0% MXU, and gains 1.77× from int8 — impossible if
  the bf16 conv were already at 90% of a unit int8 only doubles.

This script measures the same shape both ways with per-instruction FLOP
accounting parsed out of the optimized HLO, so each fusion's MXU utilization
is computed from the convolution *inside* it rather than from a guessed
shape:

  part A: standalone B32 128→128 @256² bf16 conv under several formulations
          (scan feedback as the r4 probe did, NHWC layout, no feedback cast,
          two independent chains) + the optimized scan-body HLO, to see what
          the probe actually timed (layout conversions, feedback casts).
  part B: the full flagship forward at B32 — optimized HLO → conv FLOPs per
          fusion; jax.profiler trace → duration per fusion; join → a
          per-conv-instance MXU table that supersedes both prior claims.

v5e bf16 MXU peak: 197 TFLOP/s (BENCHMARKS.md hardware notes).

Usage: python scripts/reconcile_conv_mxu.py [A|B]  (default: both)
"""

from __future__ import annotations

import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import jax
import jax.numpy as jnp
from jax import lax

PEAK_BF16 = 197e12
STEPS = 30


# ---------------------------------------------------------------- part A

def _time_scan(step, x0, *ws) -> float:
    def body(x, _):
        return step(x, *ws), ()

    @jax.jit
    def run(x, *ws):
        out, _ = lax.scan(body, x, None, length=STEPS)
        return out

    jax.block_until_ready(run(x0, *ws))
    t0 = time.perf_counter()
    jax.block_until_ready(run(x0, *ws))
    return (time.perf_counter() - t0) / STEPS


def conv_flops(batch, cin, cout, hw, k=3) -> float:
    return 2.0 * batch * hw * hw * cout * cin * k * k


def part_a(batch=32, c=128, hw=256):
    flops = conv_flops(batch, c, c, hw)
    rows = []

    # 1. r4 probe formulation: NCHW, f32 accumulate, slice+cast feedback.
    x = jnp.ones((batch, c, hw, hw), jnp.bfloat16)
    w = jnp.ones((c, c, 3, 3), jnp.bfloat16)

    def step_nchw(x, w):
        out = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32)
        return out[:, :c].astype(jnp.bfloat16)

    rows.append(("r4 probe (NCHW, f32 acc, cast feedback)", _time_scan(step_nchw, x, w)))

    # 2. same but native bf16 accumulate, no cast in the feedback path.
    def step_nchw_bf16(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.bfloat16)

    rows.append(("NCHW, bf16 acc, direct feedback", _time_scan(step_nchw_bf16, x, w)))

    # 3. NHWC layout (TPU-native): does the NCHW probe pay a relayout per step?
    xh = jnp.ones((batch, hw, hw, c), jnp.bfloat16)
    wh = jnp.ones((3, 3, c, c), jnp.bfloat16)

    def step_nhwc(x, w):
        out = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return out.astype(jnp.bfloat16)

    rows.append(("NHWC, f32 acc, cast feedback", _time_scan(step_nhwc, xh, wh)))

    def step_nhwc_bf16(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    rows.append(("NHWC, bf16 acc, direct feedback", _time_scan(step_nhwc_bf16, xh, wh)))

    # 4. two independent chains in one jit: serial-dependence check.
    def step2(xs, w):
        a, b = xs
        return (step_nchw(a, w), step_nchw(b, w))

    t2 = _time_scan(step2, (x, x + 1), w)
    rows.append(("2 independent NCHW chains (per conv)", t2 / 2.0))

    print(f"\n== part A: standalone B{batch} {c}->{c} @{hw}² bf16 conv "
          f"({flops/1e12:.3f} TFLOP) ==")
    for name, sec in rows:
        print(f"  {sec*1e3:7.3f} ms  {100*flops/(sec*PEAK_BF16):5.1f}% MXU  {name}")

    # what does the compiled scan body contain?
    def scan_probe(x, w):
        def body(x, _):
            return step_nchw(x, w), ()
        out, _ = lax.scan(body, x, None, length=STEPS)
        return out

    hlo = jax.jit(scan_probe).lower(x, w).compile().as_text()
    body = _computations(hlo)
    kinds = {}
    for cname, text in body.items():
        for op in re.finditer(r"= \S+ (transpose|copy|convert|convolution|fusion)\(", text):
            kinds[op.group(1)] = kinds.get(op.group(1), 0) + 1
    print(f"  scan-body HLO op census: {kinds}")
    return rows


# ------------------------------------------------------------- HLO parsing

def _computations(hlo: str) -> dict:
    """computation name -> body text (brace-matched, top-level blocks)."""
    comps = {}
    for m in re.finditer(r"^(?:ENTRY )?%?([\w\.\-]+)[^\n{]*\{", hlo, re.M):
        start = m.end()
        depth = 1
        i = start
        while depth and i < len(hlo):
            ch = hlo[i]
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
            i += 1
        comps[m.group(1)] = hlo[m.start():i]
    return comps


def _shape_dims(s: str):
    m = re.match(r"\w+\[([\d,]*)\]", s)
    if not m or not m.group(1):
        return []
    return [int(d) for d in m.group(1).split(",")]


def _conv_flops_from_line(line: str) -> float:
    """FLOPs of one HLO convolution instruction, from its textual form."""
    out_m = re.search(r"= (\w+\[[\d,]*\])(?:\{[^}]*\})? convolution\(", line)
    ops_m = re.search(
        r"convolution\((\w+\[[\d,]*\])(?:\{[^}]*\})? %[\w\.\-]+, (\w+\[[\d,]*\])", line)
    dl_m = re.search(r"dim_labels=(\S+?)_(\S+?)->(\S+)", line)
    fg_m = re.search(r"feature_group_count=(\d+)", line)
    if not (out_m and ops_m and dl_m):
        return 0.0
    out_dims = _shape_dims(out_m.group(1))
    rhs_dims = _shape_dims(ops_m.group(2))
    rhs_labels = dl_m.group(2)  # e.g. "oi01" / "01io"
    # contracted size = Cin(rhs 'i') × spatial kernel dims of rhs
    cin = rhs_dims[rhs_labels.index("i")]
    kprod = 1
    for j, ch in enumerate(rhs_labels):
        if ch.isdigit():
            kprod *= rhs_dims[j]
    out_elems = 1
    for d in out_dims:
        out_elems *= d
    _ = fg_m  # grouped convs: rhs 'i' is already per-group Cin, so no factor
    return 2.0 * out_elems * cin * kprod


def fusion_conv_flops(hlo: str) -> dict:
    """fusion/instruction name -> (conv FLOPs inside it, conv shape summary)."""
    comps = _computations(hlo)
    comp_conv = {}
    for cname, text in comps.items():
        tot, desc = 0.0, []
        for line in text.splitlines():
            if re.search(r"= \w+\[[\d,]*\]\S* convolution\(", line):
                f = _conv_flops_from_line(line)
                tot += f
                om = re.search(r"= (\w+\[[\d,]*\])", line)
                im = re.search(r"convolution\((\w+\[[\d,]*\])", line)
                desc.append(f"{im.group(1) if im else '?'}->{om.group(1) if om else '?'}")
        if tot:
            comp_conv[cname] = (tot, "; ".join(desc))
    # map fusion instructions to their called computation
    out = {}
    entry = None
    for cname, text in comps.items():
        if "\nENTRY" in hlo[:hlo.find(cname)] or cname.startswith("main"):
            entry = text
    for cname, text in comps.items():
        for m in re.finditer(r"%([\w\.\-]+) = \S+ fusion\([^\n]*calls=%?([\w\.\-]+)", text):
            iname, callee = m.groups()
            if callee in comp_conv:
                out[iname] = comp_conv[callee]
        for m in re.finditer(r"%([\w\.\-]+) = \S+\[[\d,]*\]\S* convolution\([^\n]*", text):
            line = m.group(0)
            f = _conv_flops_from_line(line)
            if f:
                out[m.group(1)] = (f, "bare conv")
    return out


# ---------------------------------------------------------------- part B

def part_b(batch=32):
    from fmdm_tpu.models.factories import DiffusionUNetFactory
    from __graft_entry__ import FLAGSHIP_UNET
    from scripts.parse_xplane import tpu_op_durations

    model = DiffusionUNetFactory().build(FLAGSHIP_UNET, conditioning="concatenate", channels=1)
    params = model.init(jax.random.PRNGKey(0))
    params = jax.device_put(jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params))
    x = jnp.ones((batch, 2, 256, 256), jnp.bfloat16)
    t = jnp.full((batch,), 500, jnp.int32)

    fwd = jax.jit(lambda p, x, t: model(p, x, t))
    compiled = fwd.lower(params, x, t).compile()
    hlo = compiled.as_text()
    Path("/tmp/reconcile_hlo.txt").write_text(hlo)
    conv_map = fusion_conv_flops(hlo)

    out = fwd(params, x, t)
    out.block_until_ready()
    trace_dir = "/tmp/reconcile_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = fwd(params, x, t)
        out.block_until_ready()

    durs = tpu_op_durations(trace_dir)
    joined = []
    total_ps = sum(durs.values())
    for opname, dur_ps in durs.items():
        base = opname.strip("%").split(" ")[0].split("=")[0].strip().strip("%")
        if base in conv_map:
            fl, desc = conv_map[base]
            joined.append((dur_ps, base, fl, desc))
    joined.sort(reverse=True)

    print(f"\n== part B: flagship forward @B{batch} — per-fusion conv MXU "
          f"(3 runs traced; total device {total_ps/1e9/3:.1f} ms/fwd) ==")
    print(f"  {'ms/fwd':>8} {'MXU%':>6} {'GFLOP':>8}  fusion / conv shapes")
    tot_conv_ps, tot_conv_fl = 0, 0.0
    for dur_ps, base, fl, desc in joined[:24]:
        sec = dur_ps / 1e12 / 3
        print(f"  {sec*1e3:8.2f} {100*fl/(sec*PEAK_BF16):6.1f} {fl/1e9:8.1f}  {base[:36]:38s} {desc[:70]}")
    for dur_ps, base, fl, desc in joined:
        tot_conv_ps += dur_ps
        tot_conv_fl += fl
    conv_sec = tot_conv_ps / 1e12 / 3
    print(f"  ALL conv-bearing fusions: {conv_sec*1e3:.1f} ms/fwd, "
          f"{tot_conv_fl/1e9:.0f} GFLOP, {100*tot_conv_fl/(conv_sec*PEAK_BF16):.1f}% MXU aggregate, "
          f"{100*tot_conv_ps/total_ps:.1f}% of device time")
    return joined


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "AB"
    print(f"devices: {jax.devices()}")
    if "A" in which:
        part_a()
    if "B" in which:
        part_b()
