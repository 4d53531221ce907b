#!/usr/bin/env python
"""HBM traffic accounting from optimized TPU HLO text (v2 — buffer-level).

Walks the ENTRY computation's top-level instructions.  For every
non-trivial op (fusion, convolution, custom-call, copy, reduce, ...):
  * output bytes = its result shape (tuples: sum of leaf shapes), skipping
    S(1)-annotated (VMEM-resident) buffers;
  * operand bytes = the producing instruction's result shape, resolving
    get-tuple-element chains, skipping S(1) operands and scalar-ish (<4KB)
    constants/params.
Aggregates by (kind, source file:line).  Pure-bookkeeping ops (parameter,
constant, tuple, get-tuple-element, bitcast, copy-start/done for weight
prefetch are counted separately).
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict

DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1, "f16": 2, "s64": 8, "u64": 8, "f64": 8, "s16": 2, "u16": 2,
}
SKIP = {"parameter", "constant", "tuple", "get-tuple-element", "bitcast",
        "after-all", "iota"}


def parse_shapes(text):
    """All (dtype, dims, layout) shapes in text -> list of (bytes, is_s1)."""
    out = []
    for m in re.finditer(r"(\w+)\[([\d,]*)\](\{[^}]*\})?", text):
        dt, dims, layout = m.groups()
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out.append((n * DTYPE_BYTES[dt], bool(layout and "S(1)" in layout)))
    return out


def main(path):
    lines = open(path).read().splitlines()

    # symbol table: name -> (result_text, kind, operand_names)
    sym = {}
    entry_names = []
    in_entry = False
    for ln in lines:
        s = ln.strip()
        m = re.match(r"(?:ROOT )?%([\w.\-]+) = (.+)$", s)
        if ln.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and ln.startswith("}"):
            in_entry = False
        if not m:
            continue
        name, rhs = m.groups()
        km = re.match(r"(\S+(?: \S+)*?)\s+([\w\-]+)\(", rhs)
        kind = km.group(2) if km else "?"
        # result text is everything before the kind's '('
        result_text = rhs.split(f" {kind}(")[0] if km else rhs
        ops_m = re.match(r".*?" + re.escape(kind) + r"\((.*)$", rhs) if km else None
        operands = []
        if ops_m:
            depth = 0
            buf = ops_m.group(1)
            args_txt = ""
            for ch in buf:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    if depth == 0:
                        break
                    depth -= 1
                args_txt += ch
            operands = re.findall(r"%([\w.\-]+)", args_txt)
        sym[name] = (result_text, kind, operands)
        if in_entry:
            entry_names.append(name)

    def out_bytes(name):
        rt, kind, ops = sym[name]
        if kind == "get-tuple-element":
            return parse_shapes(rt)
        return parse_shapes(rt)

    agg = defaultdict(lambda: [0.0, 0])
    tot = 0.0
    for name in entry_names:
        rt, kind, ops = sym[name]
        if kind in SKIP:
            continue
        srcline = ""
        # find source metadata from the raw line
        traffic = 0.0
        for b, s1 in parse_shapes(rt):
            if not s1:
                traffic += b
        for op in ops:
            if op not in sym:
                continue
            ort, okind, oops = sym[op]
            # resolve gte -> its own result shape is already the element
            for b, s1 in parse_shapes(ort.split(" metadata")[0]):
                if not s1 and b >= 4096:
                    traffic += b
                break  # first shape = result
        agg[kind][0] += traffic
        agg[kind][1] += 1
        tot += traffic
    print(f"TOTAL HBM (entry-level est): {tot/1e9:.2f} GB")
    for k, (b, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:18]:
        print(f"{b/1e9:8.3f} GB  n={n:4d}  {k}")


if __name__ == "__main__":
    main(sys.argv[1])
