#!/usr/bin/env python
"""Byte-account profiled XLA ops against the HBM roofline (VERDICT r03 #2).

Reads the JSONL rows printed by scripts/profile_src_fusions.py (one op per
line: full HLO text + measured ms + call count), computes each op's HBM
traffic from the operand/result shapes embedded in the HLO string, and
prints a table of measured ms vs roofline ms at the given bandwidth
(v5e HBM ~820 GB/s).

Traffic model: sum of result bytes + all operand bytes, each counted once
per call. Operands already staged in VMEM (S(1) in the layout) are counted
at zero cost when --skip-vmem is set (weights prefetched once outside the
measured span). This is the standard first-order fusion model — every
fusion reads its inputs from HBM and writes its output back.

    python scripts/fusion_roofline.py /tmp/srcfus.log [--bw 820]
"""
from __future__ import annotations

import argparse
import json
import re
import sys

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s8": 1, "u8": 1, "pred": 1, "s16": 2, "u16": 2, "f64": 8,
               "s64": 8, "u64": 8}

# dtype[1,2,3]{layout} — layout block optional (scalars: f32[])
SHAPE_RE = re.compile(r"\b(f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred)"
                      r"\[([0-9,]*)\](\{[^}]*\})?")


def shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES[dtype]


def op_traffic(hlo: str, *, skip_vmem: bool = False) -> tuple:
    """-> (result_bytes, operand_bytes). The result is everything left of
    the top-level ' = '; operands are the shapes inside the op call. Tuple
    results count every element."""
    lhs, rhs = hlo.split(" = ", 1) if " = " in hlo else ("", hlo)
    # result shapes live in rhs's head up to the first '(' of the operand
    # list: "bf16[...]{...} fusion(" or "(s32[], bf16[...]) while("
    m = re.match(r"\(?((?:[a-z0-9]+\[[0-9,]*\](?:\{[^}]*\})?(?:,\s*)?)+)\)?\s*\w",
                 rhs)
    head = m.group(1) if m else rhs.split("(")[0]
    res = sum(shape_bytes(d, s) for d, s, _ in SHAPE_RE.findall(head))
    tail = rhs[len(head):] if m else rhs
    ops = 0
    for d, s, layout in SHAPE_RE.findall(tail):
        if skip_vmem and layout and "S(1)" in layout:
            continue
        ops += shape_bytes(d, s)
    return res, ops


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--bw", type=float, default=820.0, help="GB/s")
    ap.add_argument("--skip-vmem", action="store_true", default=True)
    args = ap.parse_args(argv)

    rows = []
    for line in open(args.log):
        line = line.strip()
        if not line.startswith("{"):
            continue
        r = json.loads(line)
        if "op" not in r:
            if "buckets" in r:
                print(json.dumps(r))
            continue
        res, ops = op_traffic(r["op"], skip_vmem=args.skip_vmem)
        # Ops inside a while body (count ~ trip count) touch SLICES of
        # their big operands, not the whole buffer, each call: a
        # dynamic-slice fusion reads result-sized bytes; a DUS writes
        # them. First-order correction: for multi-call ops, clamp any
        # single operand's per-call bytes to the result size (the loop
        # collectively streams the buffer once, which the clamp preserves:
        # count * result_bytes == buffer bytes when slices tile it).
        if r["count"] > 1:
            ops = min(ops, 2 * res)
        gb = (res + ops) * r["count"] / 1e9
        roof_ms = gb / args.bw * 1e3
        rows.append({"name": r["op"].split(" =", 1)[0].lstrip("%"),
                     "ms": r["ms"], "count": r["count"],
                     "gb": round(gb, 3), "roofline_ms": round(roof_ms, 3),
                     "x_roofline": round(r["ms"] / roof_ms, 1)
                     if roof_ms > 0 else None})
    print(f"{'op':40s} {'ms':>8s} {'calls':>6s} {'GB':>7s} "
          f"{'roof ms':>8s} {'x':>6s}")
    for r in rows:
        print(f"{r['name'][:40]:40s} {r['ms']:8.3f} {r['count']:6d} "
              f"{r['gb']:7.3f} {r['roofline_ms']:8.3f} "
              f"{r['x_roofline'] if r['x_roofline'] is not None else '-':>6}")
    tot = sum(r["ms"] for r in rows)
    gbt = sum(r["gb"] for r in rows)
    print(f"{'TOTAL (listed)':40s} {tot:8.2f} {'':6s} {gbt:7.2f} "
          f"{gbt / args.bw * 1e3:8.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
