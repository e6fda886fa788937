"""
Collective-byte accounting from compiled HLO (beyond reference).

The strongest multi-chip evidence a one-chip environment can produce: for a
compiled (GSPMD-partitioned) program, extract every cross-device collective
— all-reduce / all-gather / reduce-scatter / collective-permute / all-to-all
— with its payload bytes and replica-group size, and model the per-device
ICI traffic each implies under the standard ring algorithms. Feeding each
parallel strategy's train step through this yields its collective
*signature*: a property tests can pin (a resharding regression that
silently inserts an extra all-gather changes the signature) and a table
BENCHMARKS.md can publish as expected ICI-bound scaling.

Usage:
    text = jitted.lower(*args).compile().as_text()
    cols = parse_collectives(text)
    summary = collective_summary(cols)          # kind -> count/bytes
    per_dev = ici_bytes_per_device(cols)        # modeled ring traffic

Scope notes:
 - Parses the optimized HLO module text (post-SPMD-partitioning), so the
   shapes are the per-device shard shapes.
 - Async pairs (`all-gather-start`/`-done`) are counted once, at `-start`;
   XLA:CPU/TPU sometimes wraps collectives in `async-start` fusions whose
   inner computation carries the op — the regex matches the op name anywhere
   a shape is assigned, which covers both spellings.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "f8e4m3fn": 1, "f8e5m2": 1, "f8e4m3": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

_COLLECTIVE_KINDS = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)

# `%name = <shape> <kind>(`  or  `%name = <shape> <kind>-start(`
_OP_RE = re.compile(
    r"=\s*(?P<shape>\([^)]*\)|[a-z0-9]+\[[0-9,]*\](?:\{[^}]*\})?)\s*"
    r"(?P<kind>" + "|".join(_COLLECTIVE_KINDS) + r")(?P<start>-start)?\("
)
_SHAPE_RE = re.compile(r"(?P<dtype>[a-z][a-z0-9]*)\[(?P<dims>[0-9,]*)\]")
_GROUPS_RE = re.compile(r"replica_groups=\{(?P<groups>\{[^=]*?\})\}")
_SRC_TGT_RE = re.compile(r"source_target_pairs=\{(?P<pairs>[^}]*\}[^}]*)\}")


def _shape_bytes(shape_text: str) -> int:
    """Total bytes of a shape string — 'f32[8,16]{1,0}' or a tuple
    '(f32[8], bf16[4,4])'. Token/opaque/unknown dtypes count as 0."""
    total = 0
    for m in _SHAPE_RE.finditer(shape_text):
        size = _DTYPE_BYTES.get(m.group("dtype"))
        if size is None:
            continue
        dims = m.group("dims")
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * size
    return total


def _group_size(line: str) -> Optional[int]:
    """Participant count per replica group, if the line carries one."""
    m = _GROUPS_RE.search(line)
    if m:
        first = m.group("groups").split("}")[0].lstrip("{")
        ids = [s for s in first.split(",") if s.strip()]
        return len(ids) if ids else None
    m = _SRC_TGT_RE.search(line)
    if m:  # collective-permute: a ring of k pairs involves k devices
        return m.group("pairs").count("{")
    return None


def parse_collectives(hlo_text: str) -> List[Dict]:
    """All cross-device collectives in an optimized HLO module text.

    Returns dicts: kind, bytes (per-device payload = the op's result shape),
    group_size (participants per replica group, None if unstated), line.
    `-done` halves of async pairs are skipped (the `-start` carries the op);
    `-start` tuple shapes include the input alias, so for starts the result
    payload is half the tuple total (input, output) where that heuristic
    applies — recorded as-is otherwise.
    """
    out = []
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if m is None:
            continue
        kind = m.group("kind")
        shape = m.group("shape")
        nbytes = _shape_bytes(shape)
        if m.group("start") and shape.startswith("("):
            # async start: result is (operand alias, result[, contexts]) —
            # count the payload once, not the alias too
            nbytes = nbytes // 2
        out.append({
            "kind": kind,
            "bytes": nbytes,
            "group_size": _group_size(line),
            "line": line.strip(),
        })
    return out


def collective_summary(collectives: List[Dict]) -> Dict[str, Dict[str, int]]:
    """Aggregate: kind -> {count, bytes} (bytes = sum of per-device payload)."""
    summary: Dict[str, Dict[str, int]] = {}
    for c in collectives:
        entry = summary.setdefault(c["kind"], {"count": 0, "bytes": 0})
        entry["count"] += 1
        entry["bytes"] += c["bytes"]
    return summary


def ici_bytes_per_device(collectives: List[Dict], default_group: int = 2) -> int:
    """Modeled per-device ICI traffic (bytes sent) under ring algorithms.

    Standard ring costs for payload P over g participants:
      all-reduce:          2 * P * (g-1)/g      (reduce-scatter + all-gather)
      all-gather:          P * (g-1)/g          (P = full gathered output)
      reduce-scatter:      P * (g-1)            (P = scattered output shard;
                                                 each device forwards g-1
                                                 shard-sized chunks)
      collective-permute:  P                    (one hop)
      all-to-all:          P * (g-1)/g
    """
    total = 0.0
    for c in collectives:
        g = c["group_size"] or default_group
        p = c["bytes"]
        k = c["kind"]
        if g <= 1:
            continue
        if k == "all-reduce":
            total += 2.0 * p * (g - 1) / g
        elif k == "all-gather":
            total += p * (g - 1) / g
        elif k == "reduce-scatter":
            total += p * (g - 1)
        elif k == "collective-permute":
            total += p
        elif k == "all-to-all":
            total += p * (g - 1) / g
    return int(total)


def run_self_tests() -> None:
    """Embedded self-test tier (run_tests.py harness)."""
    text = """
  %ar = f32[8,16]{1,0} all-reduce(%x), replica_groups={{0,1},{2,3}}, to_apply=%add
  %ag.1 = bf16[32]{0} all-gather(%y), replica_groups={{0,1,2,3}}, dimensions={0}
  %rs = f32[4]{0} reduce-scatter(%z), replica_groups={{0,1,2,3}}, to_apply=%add
  %cp = f32[2,2]{1,0} collective-permute(%w), source_target_pairs={{0,1},{1,0}}
  %ard = (f32[8]{0}, f32[8]{0}) all-reduce-start(%v), replica_groups={{0,1}}
  %done = f32[8]{0} all-reduce-done(%ard)
"""
    cols = parse_collectives(text)
    kinds = [c["kind"] for c in cols]
    assert kinds == ["all-reduce", "all-gather", "reduce-scatter",
                     "collective-permute", "all-reduce"], kinds
    assert cols[0]["bytes"] == 8 * 16 * 4 and cols[0]["group_size"] == 2
    assert cols[1]["bytes"] == 32 * 2 and cols[1]["group_size"] == 4
    assert cols[4]["bytes"] == 8 * 4  # async start counted once
    s = collective_summary(cols)
    assert s["all-reduce"]["count"] == 2
    per_dev = ici_bytes_per_device(cols)
    assert per_dev > 0
