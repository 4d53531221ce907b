#!/usr/bin/env python
"""Rough per-op HBM traffic accounting from an optimized HLO text dump.

Parses the ENTRY computation's top-level instructions, sizes every operand
and output buffer from its shape string, and aggregates by (op kind,
source line).  Fusion-internal instructions are skipped — a fusion's
traffic is its operands + outputs, which is exactly what we want for a
bandwidth-roofline view.  S(1)-annotated buffers live in VMEM and are
counted separately (they do not touch HBM).
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict

DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1, "f16": 2, "s64": 8, "u64": 8, "f64": 8,
}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\](?:\{[^}]*\})?")


def shape_bytes(text: str) -> tuple[int, int]:
    """(hbm_bytes, vmem_bytes) summed over all shapes in `text`."""
    hbm = vmem = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\](\{[^}]*\})?", text):
        dt, dims, layout = m.groups()
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        b = n * DTYPE_BYTES[dt]
        if layout and "S(1)" in layout:
            vmem += b
        else:
            hbm += b
    return hbm, vmem


def main(path: str) -> None:
    lines = open(path).read().splitlines()
    in_entry = False
    agg = defaultdict(lambda: [0, 0, 0])  # key -> [hbm, vmem, count]
    total = 0
    for ln in lines:
        if ln.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and ln.startswith("}"):
            break
        if not in_entry:
            continue
        s = ln.strip()
        if not s.startswith("%") and not s.startswith("ROOT"):
            continue
        # output shape = first shape after '='; operands inside (...)
        eq = s.split(" = ", 1)
        if len(eq) != 2:
            continue
        rhs = eq[1]
        kind = rhs.split("(")[0].split(" ")[-1] if " " in rhs.split("(")[0] else rhs.split("(")[0]
        # kind: text between shape and '(' e.g. 'convolution', 'fusion', ...
        m = re.match(r"\S+\s+(\S+)\(", rhs)
        kind = m.group(1) if m else "?"
        if kind in ("parameter", "constant", "get-tuple-element", "tuple", "bitcast"):
            continue
        srcm = re.search(r'source_file="([^"]+)" source_line=(\d+)', ln)
        src = (
            f"{srcm.group(1).split('/')[-1]}:{srcm.group(2)}" if srcm else "?"
        )
        # operands: text inside the first top-level (...) — shapes appear with
        # their defs earlier, so operand shapes aren't inline.  Instead use
        # a simpler proxy: count the output only, and add operand shapes when
        # written inline (custom-call etc.).  To get operand sizes we build a
        # symbol table.
        agg_key = (kind, src)
        out_hbm, out_vmem = shape_bytes(rhs.split("(")[0])
        agg[agg_key][0] += out_hbm
        agg[agg_key][1] += out_vmem
        agg[agg_key][2] += 1
        total += out_hbm

    # Second pass with a symbol table for operand sizes
    symtab = {}
    for ln in lines:
        s = ln.strip()
        m = re.match(r"(?:ROOT )?%([\w.\-]+) = (\S+)", s)
        if m:
            symtab[m.group(1)] = shape_bytes(m.group(2))

    agg2 = defaultdict(lambda: [0, 0, 0])
    in_entry = False
    for ln in lines:
        if ln.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and ln.startswith("}"):
            break
        if not in_entry:
            continue
        s = ln.strip()
        eq = s.split(" = ", 1)
        if len(eq) != 2:
            continue
        rhs = eq[1]
        m = re.match(r"\S+\s+([\w\-]+)\(", rhs)
        kind = m.group(1) if m else "?"
        if kind in ("parameter", "constant", "get-tuple-element", "tuple", "bitcast"):
            continue
        srcm = re.search(r'source_file="([^"]+)" source_line=(\d+)', ln)
        src = f"{srcm.group(1).split('/')[-1]}:{srcm.group(2)}" if srcm else "?"
        out_hbm, out_vmem = shape_bytes(rhs.split("(", 1)[0])
        op_hbm = op_vmem = 0
        args = re.findall(r"%([\w.\-]+)", rhs.split("(", 1)[1].split(")")[0])
        for a in args:
            if a in symtab:
                h, v = symtab[a]
                op_hbm += h
                op_vmem += v
        k = (kind, src)
        agg2[k][0] += out_hbm + op_hbm
        agg2[k][1] += out_vmem + op_vmem
        agg2[k][2] += 1

    rows = sorted(agg2.items(), key=lambda kv: -kv[1][0])
    tot_hbm = sum(v[0] for v in agg2.values())
    tot_vmem = sum(v[1] for v in agg2.values())
    print(f"TOTAL HBM {tot_hbm/1e9:.2f} GB   VMEM-resident {tot_vmem/1e9:.2f} GB")
    for (kind, src), (h, v, c) in rows[:40]:
        print(f"{h/1e9:7.3f} GB  vmem {v/1e9:6.3f}  n={c:3d}  {kind:24s} {src}")


if __name__ == "__main__":
    main(sys.argv[1])
