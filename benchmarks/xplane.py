"""Minimal XSpace (.xplane.pb) parser: per-op device-time aggregation.

``jax.profiler.trace`` dumps XSpace protos, but neither ``xplane_pb2`` nor
the tensorboard-plugin convert path is importable in this environment
(xprof ships without the xplane proto module).  This walks the protobuf
wire format by field number directly — enough to aggregate event durations
by name on the TPU "XLA Ops" lines, which is all the per-stage roofline
analysis needs.

Wire schema walked (tensorflow/compiler/xla tsl xplane.proto):
  XSpace.planes = 1 (LEN)
  XPlane: id=1, name=2 (LEN), lines=3 (LEN), event_metadata=4 (map LEN),
          stat_metadata=5
  XLine:  id=1, name=2 (LEN), events=4 (LEN)
  XEvent: metadata_id=1 (varint), offset_ps=2, duration_ps=3 (varint)
  XEventMetadata: id=1, name=2 (LEN), display_name=4

Usage:
  from benchmarks.xplane import aggregate_device_ops
  rows = aggregate_device_ops("/tmp/trace_dir")   # [(name, total_ms, n)]
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one message's fields.

    value is an int for varint fields, bytes for LEN fields; 32/64-bit
    fixed fields are skipped (not used by the schema above).
    """
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _varint(buf, pos)
            yield field, wire, val
        elif wire == 2:  # length-delimited
            ln, pos = _varint(buf, pos)
            yield field, wire, buf[pos : pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            pos += 4
        elif wire == 1:  # 64-bit
            pos += 8
        else:  # groups (3/4): not emitted by xplane writers
            raise ValueError(f"unsupported wire type {wire}")


def _parse_event(buf: bytes) -> tuple[int, int]:
    meta_id = dur_ps = 0
    for f, w, v in iter_fields(buf):
        if f == 1 and w == 0:
            meta_id = v
        elif f == 3 and w == 0:
            dur_ps = v
    return meta_id, dur_ps


def _parse_metadata_entry(buf: bytes) -> tuple[int, str]:
    """map<int64, XEventMetadata> entry -> (id, name)."""
    key, name = 0, ""
    for f, w, v in iter_fields(buf):
        if f == 1 and w == 0:
            key = v
        elif f == 2 and w == 2:
            for f2, w2, v2 in iter_fields(v):
                if f2 == 2 and w2 == 2:
                    name = v2.decode(errors="replace")
    return key, name


def aggregate_device_ops(
    trace_dir: str, line_filter: str = "XLA Ops", plane_filter: str = "TPU"
) -> list[tuple[str, float, int]]:
    """Aggregate per-op device time from an xplane dump directory.

    Returns [(op_name, total_ms, occurrences)] sorted by time descending,
    over planes whose name contains ``plane_filter`` and lines whose name
    contains ``line_filter``.
    """
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    agg: dict[str, list[float]] = defaultdict(lambda: [0.0, 0])
    for path in paths:
        with open(path, "rb") as f:
            space = f.read()
        for f_no, w, plane_buf in iter_fields(space):
            if f_no != 1 or w != 2:
                continue
            name, lines, metadata = "", [], {}
            for pf, pw, pv in iter_fields(plane_buf):
                if pf == 2 and pw == 2:
                    name = pv.decode(errors="replace")
                elif pf == 3 and pw == 2:
                    lines.append(pv)
                elif pf == 4 and pw == 2:
                    k, v = _parse_metadata_entry(pv)
                    metadata[k] = v
            if plane_filter not in name:
                continue
            for line_buf in lines:
                line_name, events = "", []
                for lf, lw, lv in iter_fields(line_buf):
                    if lf == 2 and lw == 2:
                        line_name = lv.decode(errors="replace")
                    elif lf == 4 and lw == 2:
                        events.append(lv)
                if line_filter not in line_name:
                    continue
                for ev in events:
                    meta_id, dur_ps = _parse_event(ev)
                    op = metadata.get(meta_id, f"#{meta_id}")
                    entry = agg[op]
                    entry[0] += dur_ps * 1e-9  # ps -> ms
                    entry[1] += 1
    rows = [(k, v[0], v[1]) for k, v in agg.items()]
    rows.sort(key=lambda r: -r[1])
    return rows


def grouped_summary(
    rows: list[tuple[str, float, int]], top: int = 25
) -> str:
    """Human-readable table of the aggregate rows."""
    total = sum(r[1] for r in rows)
    out = [f"total device time: {total:.3f} ms over {len(rows)} distinct ops"]
    for name, ms, n in rows[:top]:
        out.append(f"{ms:9.3f} ms  x{n:<6d} {name[:90]}")
    return "\n".join(out)


if __name__ == "__main__":
    import sys

    rows = aggregate_device_ops(sys.argv[1])
    print(grouped_summary(rows))
