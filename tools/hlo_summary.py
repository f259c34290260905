#!/usr/bin/env python3
"""Summarize an optimized HLO text dump for perf triage.

Made for the batch>1 per-frame slowdown investigation (VERDICT r3 weak
item 2): run tools/mfu_probe.py --dump-hlo out/hlo_r4, then

  python tools/hlo_summary.py out/hlo_r4/forward_b1.hlo out/hlo_r4/forward_b4.hlo

prints, per file: op-kind histogram, every convolution with its shapes /
window / feature-group config, fusion count, and all layout-changing ops
(transpose/copy/bitcast-convert) with byte volumes — the usual suspects
when per-frame cost RISES with batch.
"""

import re
import sys
from collections import Counter

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(s: str) -> int:
    m = _SHAPE_RE.match(s)
    if not m:
        return 0
    dtype, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    width = {"f32": 4, "bf16": 2, "s32": 4, "f16": 2, "u8": 1, "s8": 1,
             "pred": 1, "f64": 8, "u32": 4}.get(dtype, 4)
    return n * width


def summarize(path: str) -> None:
    kinds = Counter()
    convs, layouts, fusions = [], [], 0
    big_copies = 0.0
    for line in open(path):
        line = line.strip()
        m = re.match(r"%?[\w.-]+ = (\w+\[[\d,]*\]\{?[\d,]*\}?) (\w+)", line)
        if not m:
            continue
        out_shape, op = m.groups()
        kinds[op] += 1
        if op == "convolution":
            win = re.search(r"window={([^}]*)}", line)
            dnums = re.search(r"dim_labels=(\S+?),", line)
            feat = re.search(r"feature_group_count=(\d+)", line)
            ins = re.findall(r"%[\w.-]+", line)
            convs.append(
                f"  conv out={out_shape.split('{')[0]} "
                f"win=[{win.group(1) if win else '?'}] "
                f"dims={dnums.group(1) if dnums else '?'}"
                + (f" groups={feat.group(1)}" if feat else "")
            )
        elif op == "fusion":
            fusions += 1
        elif op in ("transpose", "copy", "bitcast", "reshape"):
            b = shape_bytes(out_shape)
            if b >= 1 << 20:  # only layout traffic >= 1 MiB
                layouts.append(f"  {op} {out_shape.split('{')[0]} "
                               f"({b / 1e6:.1f} MB)")
                if op in ("transpose", "copy"):
                    big_copies += b
    print(f"== {path}")
    print("  op histogram:",
          dict(sorted(kinds.items(), key=lambda kv: -kv[1])[:12]))
    print(f"  fusions: {fusions}   "
          f"layout traffic (transpose+copy >=1MB): {big_copies / 1e6:.1f} MB")
    for c in convs:
        print(c)
    for l in layouts:
        print(l)


if __name__ == "__main__":
    for p in sys.argv[1:]:
        summarize(p)
