"""Minimal XSpace/.xplane.pb reader: per-op device-time summary, no TF needed.

jax.profiler writes TensorFlow XSpace protos; this decodes just enough of the
wire format (planes -> lines -> events + event_metadata names) to sum device
time by op name. Used by scripts/trace_step.py for the perf decompositions in
ARCHITECTURE.md.

Usage: python scripts/xplane.py <trace_dir_or_xplane.pb> [top_n]
"""

from __future__ import annotations

import glob
import os
import sys


def _varint(buf: bytes, i: int):
    r, s = 0, 0
    while True:
        b = buf[i]
        r |= (b & 0x7F) << s
        i += 1
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v, i = buf[i:i + 8], i + 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v, i = buf[i:i + ln], i + ln
        elif wt == 5:
            v, i = buf[i:i + 4], i + 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse_xspace(path: str):
    """-> list of planes: {name, lines: [{name, events:[(meta_id, dur_ps)]}],
    meta: {id: name}}."""
    data = open(path, "rb").read()
    planes = []
    for fn, _, v in _fields(data):
        if fn != 1:
            continue
        plane = {"name": "", "lines": [], "meta": {}}
        for pf, _, pv in _fields(v):
            if pf == 2:
                plane["name"] = pv.decode("utf-8", "replace")
            elif pf == 3:
                line = {"name": "", "events": []}
                for lf, lwt, lv in _fields(pv):
                    if lf == 2 and lwt == 2:
                        try:
                            line["name"] = lv.decode("utf-8")
                        except UnicodeDecodeError:
                            pass
                    elif lf == 4 and lwt == 2:
                        # XEvent: 1=metadata_id, 2=offset_ps, 3=duration_ps
                        mid = dur = 0
                        ok = False
                        try:
                            for ef, ewt, ev in _fields(lv):
                                if ef == 1 and ewt == 0:
                                    mid, ok = ev, True
                                elif ef == 3 and ewt == 0:
                                    dur = ev
                        except (ValueError, IndexError):
                            ok = False
                        if ok:
                            line["events"].append((mid, dur))
                plane["lines"].append(line)
            elif pf == 4:  # map<int64, XEventMetadata>
                mid, name = 0, ""
                for mf, _, mv in _fields(pv):
                    if mf == 1:
                        mid = mv
                    elif mf == 2:
                        for ef, _, ev in _fields(mv):
                            if ef == 2:
                                name = ev.decode("utf-8", "replace")
                plane["meta"][mid] = name
        planes.append(plane)
    return planes


def device_op_summary(trace_dir: str):
    """Sum event durations by op name over device planes (name contains
    'TPU' or '/device:'). -> {plane_name: {op_name: total_ps}}."""
    paths = [trace_dir]
    if os.path.isdir(trace_dir):
        paths = glob.glob(
            os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    out = {}
    for p in paths:
        for plane in parse_xspace(p):
            for line in plane["lines"]:
                agg = out.setdefault(f"{plane['name']} :: {line['name']}", {})
                for mid, dur in line["events"]:
                    name = plane["meta"].get(mid, f"#{mid}")
                    agg[name] = agg.get(name, 0) + dur
    return out


def source_line_summary(trace_dir: str, hlo_path: str, n_dispatch: int = 1):
    """Join device-op durations with the optimized HLO's per-op
    ``source_file``/``source_line`` metadata -> {"file.py:line": ms} per
    dispatch, plus an "unattributed" bucket keyed by op class.

    This is how the round-4 flagship-train decomposition was produced:
    dump the compiled module via ``jitted.lower(...).compile().as_text()``,
    trace the same program (scripts/trace_step.py), then attribute. Ops
    with no metadata (copies/slices inserted by layout assignment) land in
    the unattributed bucket.
    """
    import re

    src = {}
    pat = re.compile(
        r"%([\w.\-]+) = .*?source_file=\"([^\"]+)\" source_line=(\d+)")
    with open(hlo_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                src[m.group(1)] = f"{m.group(2).split('/')[-1]}:{m.group(3)}"

    by_source, unattr = {}, {}
    for pname, ops in device_op_summary(trace_dir).items():
        if "Async" in pname or "XLA Ops" not in pname:
            continue
        for name, ps in ops.items():
            base = name.split(" ")[0].lstrip("%")
            ms = ps / 1e9 / n_dispatch
            if base in src:
                by_source[src[base]] = by_source.get(src[base], 0.0) + ms
            else:
                cls = re.sub(r"\.\d+$", "", base)
                unattr[cls] = unattr.get(cls, 0.0) + ms
    return by_source, unattr


def main():
    if len(sys.argv) > 2 and sys.argv[2].endswith((".hlo", ".txt")):
        # by-source mode: xplane.py <trace_dir> <optimized.hlo> [n_dispatch]
        n = int(sys.argv[3]) if len(sys.argv) > 3 else 1
        by_source, unattr = source_line_summary(sys.argv[1], sys.argv[2], n)
        total = sum(by_source.values()) + sum(unattr.values())
        print(f"total {total:.2f} ms/dispatch "
              f"(attributed {sum(by_source.values()):.2f})")
        for k, ms in sorted(by_source.items(), key=lambda kv: -kv[1])[:30]:
            print(f"{ms:8.3f} ms  {k}")
        print("--- unattributed by op class ---")
        for k, ms in sorted(unattr.items(), key=lambda kv: -kv[1])[:10]:
            print(f"{ms:8.3f} ms  {k}")
        return
    trace = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    for pname, agg in device_op_summary(trace).items():
        total = sum(agg.values())
        if not total:
            continue
        print(f"\n=== {pname}  (total {total / 1e9:.3f} ms across events)")
        for name, ps in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{ps / 1e9:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
