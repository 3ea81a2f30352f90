"""Aggregate per-op device time from a jax.profiler trace (xplane proto).

Shared by the roofline probes (the encoder analysis in PERF.md used this
aggregation ad hoc in round 2; the training roofline makes it a tool).
Parses the `*.xplane.pb` file a `jax.profiler.trace(dir)` capture writes
and sums XEvent durations per op on the device plane, so a step's wall
time can be attributed to named XLA ops (fusions, convolutions, copies).
"""

from __future__ import annotations

from pathlib import Path


def _load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(Path(trace_dir).rglob("*.xplane.pb"))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(paths[-1].read_bytes())
    return xspace


def op_table(trace_dir: str, plane_substr: str = "TPU") -> list[dict]:
    """[{name, total_us, count, line}] sorted by total_us desc, aggregated
    over every line of the first device plane matching ``plane_substr``
    (falls back to the CPU/host XLA plane if no device plane exists)."""
    xspace = _load_xspace(trace_dir)
    planes = [p for p in xspace.planes if plane_substr in p.name]
    if not planes:  # interpret/CPU runs
        planes = [p for p in xspace.planes if "/device:" in p.name] or list(
            xspace.planes)
    agg: dict[tuple, dict] = {}
    for plane in planes[:1]:
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                key = (line.name, name)
                d = agg.setdefault(
                    key, {"name": name, "line": line.name,
                          "total_us": 0.0, "count": 0})
                d["total_us"] += ev.duration_ps / 1e6
                d["count"] += 1
    return sorted(agg.values(), key=lambda d: -d["total_us"])


def line_names(trace_dir: str) -> list[tuple[str, str, int]]:
    """(plane, line, n_events) inventory — for picking the right plane."""
    xspace = _load_xspace(trace_dir)
    return [(p.name, ln.name, len(ln.events))
            for p in xspace.planes for ln in p.lines]


if __name__ == "__main__":
    import sys

    for row in op_table(sys.argv[1])[:40]:
        print(f"{row['total_us']:12,.1f} us  x{row['count']:<5d} "
              f"[{row['line']}] {row['name'][:110]}")
