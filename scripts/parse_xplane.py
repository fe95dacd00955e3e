#!/usr/bin/env python3
"""Minimal XSpace (jax.profiler xplane.pb) parser — no TF needed.

Aggregates per-op device time from a ``jax.profiler.trace`` capture and
prints the top ops with their framework source attribution. This is
the PERF.md profiling workflow in one command:

    python scripts/parse_xplane.py /tmp/prof  [top_n]

Hand-rolled protobuf wire decoding for the XSpace/XPlane/XLine/XEvent
subset we need (the tensorflow profiler protos aren't installed here).
"""

import glob
import sys
from collections import Counter


def _varint(buf, i):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse_plane(buf):
    name = ""
    lines = []
    emeta = {}
    smeta = {}
    for fno, wt, v in fields(buf):
        if fno == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fno == 3 and wt == 2:
            lines.append(v)
        elif fno in (4, 5) and wt == 2:
            # map entry {int64 key=1, XEventMetadata/XStatMetadata value=2}
            key = None
            val = None
            for f2, w2, v2 in fields(v):
                if f2 == 1:
                    key = v2
                elif f2 == 2:
                    val = v2
            mname = ""
            if val is not None:
                for f3, w3, v3 in fields(val):
                    if f3 == 2 and w3 == 2:
                        mname = v3.decode("utf-8", "replace")
            (emeta if fno == 4 else smeta)[key] = mname
    return name, lines, emeta, smeta


def parse_events(line_buf):
    for fno, wt, v in fields(line_buf):
        if fno == 4 and wt == 2:  # XEvent
            mid = 0
            dur = 0
            stats = []
            for f2, w2, v2 in fields(v):
                if f2 == 1:
                    mid = v2
                elif f2 == 3:
                    dur = v2
                elif f2 == 4 and w2 == 2:
                    stats.append(v2)
            yield mid, dur, stats


def stat_kv(stat_buf, smeta):
    mid = 0
    val = None
    for fno, wt, v in fields(stat_buf):
        if fno == 1:
            mid = v
        elif fno == 5 and wt == 2:
            val = v.decode("utf-8", "replace")
        elif fno in (3, 4):
            val = v
        elif fno == 2:
            import struct

            val = struct.unpack("<d", v)[0]
    return smeta.get(mid, str(mid)), val


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    paths = sorted(glob.glob(f"{root}/**/*.xplane.pb", recursive=True))
    assert paths, f"no xplane.pb under {root}"
    buf = open(paths[-1], "rb").read()

    planes = []
    for fno, wt, v in fields(buf):
        if fno == 1 and wt == 2:
            planes.append(parse_plane(v))
    for name, lines, _, _ in planes:
        n_ev = sum(1 for lb in lines for _ in parse_events(lb))
        print(f"plane {name!r}: {len(lines)} lines, {n_ev} events")

    for name, lines, emeta, smeta in planes:
        if "TPU" not in name and "Device" not in name:
            continue
        durs = Counter()
        srcs = {}
        for lb in lines:
            for mid, dur, stats in parse_events(lb):
                op = emeta.get(mid, str(mid))
                durs[op] += dur
                if op not in srcs:
                    for sb in stats:
                        k, v = stat_kv(sb, smeta)
                        if k in ("source", "tf_op", "source_info"):
                            srcs[op] = str(v)[:80]
        total = sum(durs.values())
        print(f"\n== {name}: total {total/1e9:.2f} ms device time ==")
        for op, d in durs.most_common(top_n):
            print(f"{d/1e9:9.2f} ms {100*d/max(total,1):5.1f}%  "
                  f"{op[:58]:58s} {srcs.get(op, '')}")


if __name__ == "__main__":
    main()
