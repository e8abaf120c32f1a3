"""Minimal xplane.pb parser: aggregate per-op device time from a
jax.profiler trace without tensorflow (the tensorboard plugin's converter
needs TF internals this image lacks).

Usage: python benchmarks/parse_xplane.py <trace.xplane.pb> [top_n]
"""

import struct
import sys
from collections import defaultdict


def read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value_bytes_or_int) of a message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = read_varint(buf, pos)
        fnum = tag >> 3
        wt = tag & 7
        if wt == 0:
            val, pos = read_varint(buf, pos)
        elif wt == 1:
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, val


def parse(path, top_n=30):
    buf = open(path, "rb").read()
    # XSpace: planes = 1
    for fnum, wt, plane in fields(buf):
        if fnum != 1:
            continue
        name = ""
        lines = []
        meta = {}
        for f2, w2, v in fields(plane):
            if f2 == 2 and w2 == 2:
                name = v.decode(errors="replace")
            elif f2 == 3 and w2 == 2:
                lines.append(v)
            elif f2 == 4 and w2 == 2:
                # map entry: key=1 varint, value=2 XEventMetadata
                k = None
                mname = ""
                for f3, w3, v3 in fields(v):
                    if f3 == 1 and w3 == 0:
                        k = v3
                    elif f3 == 2 and w3 == 2:
                        for f4, w4, v4 in fields(v3):
                            if f4 == 2 and w4 == 2:
                                mname = v4.decode(errors="replace")
                if k is not None:
                    meta[k] = mname
        if "TPU" not in name and "tpu" not in name.lower():
            continue
        totals = defaultdict(int)
        counts = defaultdict(int)
        for line in lines:
            for f3, w3, v3 in fields(line):
                if f3 == 4 and w3 == 2:  # XEvent (XLine.events = 4)
                    mid = dur = 0
                    for f4, w4, v4 in fields(v3):
                        if f4 == 1 and w4 == 0:
                            mid = v4
                        elif f4 == 3 and w4 == 0:
                            dur = v4
                    totals[mid] += dur
                    counts[mid] += 1
        rows = sorted(totals.items(), key=lambda kv: -kv[1])
        total_ms = sum(totals.values()) / 1e9
        print(f"=== plane: {name}  (total device-op time {total_ms:.2f} ms)")
        for mid, dur in rows[:top_n]:
            print(f"{dur / 1e9:9.3f} ms  x{counts[mid]:<5d} {meta.get(mid, mid)[:110]}")
        ledger(totals, meta, total_ms)


# fragment -> pipeline stage, first match wins (op names are XLA fusion
# names; the custom-call names carry the pallas kernel symbol)
STAGE_RULES = [
    ("sad", "match: SAD scan (pallas)"),
    ("patch", "refine: patch extract (pallas)"),
    ("plane", "mono scale: plane density (pallas)"),
    ("conv", "detect: filters"),
    ("reduce-window", "detect: NMS / pooling"),
    ("while", "estimate: GN / RANSAC loops"),
    ("sort", "sort / top-k"),
    ("top-k", "sort / top-k"),
    ("scatter", "compaction / gathers"),
    ("gather", "compaction / gathers"),
    ("dynamic-update", "compaction / gathers"),
    ("iota", "elementwise fusions"),
    ("fusion", "elementwise fusions"),
    ("copy", "layout copies"),
    ("transpose", "layout copies"),
]


def ledger(totals, meta, total_ms):
    """Group per-op device time into pipeline stages (the roofline ledger
    input; see BASELINE.md 'Speed-of-light ledger')."""
    stages = defaultdict(float)
    for mid, dur in totals.items():
        nm = meta.get(mid, str(mid)).lower()
        for frag, stage in STAGE_RULES:
            if frag in nm:
                stages[stage] += dur / 1e9
                break
        else:
            stages["other"] += dur / 1e9
    print("--- stage ledger ---")
    for stage, ms in sorted(stages.items(), key=lambda kv: -kv[1]):
        print(f"{ms:9.3f} ms  {100 * ms / max(total_ms, 1e-9):5.1f}%  {stage}")


if __name__ == "__main__":
    parse(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
