"""Minimal XSpace (.xplane.pb) op-time extractor — no tensorflow needed.

The tensorboard profiler plugin is broken in this container (protobuf /
pywrap mismatches), so this walks the protobuf wire format generically:
XSpace.planes(1) -> XPlane{name=2, lines=3, event_metadata=4(map)} ->
XLine{events=4} -> XEvent{metadata_id=1, duration_ps=3}. Aggregates device-
plane event durations by metadata name and prints the top-K. Device-plane
events at line granularity are XLA op executions (self time per op region).

Usage: python scripts/xplane_opstats.py <trace.xplane.pb> [topk]
"""

import struct
import sys


def walk(buf, pos, end):
    """Yield (field_no, wire_type, value, raw_bytes) records."""
    while pos < end:
        tag, pos = read_varint(buf, pos)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = read_varint(buf, pos)
            yield fno, wt, v, None
        elif wt == 1:
            v = struct.unpack_from("<q", buf, pos)[0]
            pos += 8
            yield fno, wt, v, None
        elif wt == 2:
            ln, pos = read_varint(buf, pos)
            yield fno, wt, None, (pos, pos + ln)
            pos += ln
        elif wt == 5:
            v = struct.unpack_from("<i", buf, pos)[0]
            pos += 4
            yield fno, wt, v, None
        else:
            raise ValueError(f"wire type {wt}")


def read_varint(buf, pos):
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def parse_plane(buf, span):
    name = ""
    meta = {}
    lines = []
    for fno, wt, v, sp in walk(buf, *span):
        if fno == 2 and wt == 2:
            name = buf[sp[0] : sp[1]].decode("utf-8", "replace")
        elif fno == 3 and wt == 2:
            lines.append(sp)
        elif fno == 4 and wt == 2:  # map<int64, XEventMetadata>
            k = None
            mname = None
            for f2, w2, v2, sp2 in walk(buf, *sp):
                if f2 == 1 and w2 == 0:
                    k = v2
                elif f2 == 2 and w2 == 2:  # XEventMetadata
                    for f3, w3, v3, sp3 in walk(buf, *sp2):
                        if f3 == 2 and w3 == 2:
                            mname = buf[sp3[0] : sp3[1]].decode("utf-8", "replace")
            if k is not None:
                meta[k] = mname or f"meta_{k}"
    return name, meta, lines


def parse_line_events(buf, span):
    """Yield (metadata_id, duration_ps)."""
    for fno, wt, v, sp in walk(buf, *span):
        if fno == 4 and wt == 2:  # XEvent
            mid = 0
            dur = 0
            for f2, w2, v2, sp2 in walk(buf, *sp):
                if f2 == 1 and w2 == 0:
                    mid = v2
                elif f2 == 3 and w2 == 0:
                    dur = v2
            yield mid, dur


def main():
    path = sys.argv[1]
    topk = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    buf = open(path, "rb").read()
    for fno, wt, v, sp in walk(buf, 0, len(buf)):
        if fno != 1 or wt != 2:
            continue
        pname, meta, lines = parse_plane(buf, sp)
        if "TPU" not in pname and "Device" not in pname:
            continue
        agg = {}
        cnt = {}
        for lsp in lines:
            for mid, dur in parse_line_events(buf, lsp):
                nm = meta.get(mid, str(mid))
                agg[nm] = agg.get(nm, 0) + dur
                cnt[nm] = cnt.get(nm, 0) + 1
        if not agg:
            continue
        tot = sum(agg.values())
        print(f"\n== plane: {pname}  total {tot/1e9:.3f} ms ==")
        for nm, d in sorted(agg.items(), key=lambda kv: -kv[1])[:topk]:
            print(f"  {d/tot*100:5.1f}%  {d/1e9:8.3f} ms  x{cnt[nm]:<5d} {nm[:110]}")


if __name__ == "__main__":
    main()
