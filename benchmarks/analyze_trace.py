#!/usr/bin/env python
"""Summarize an xplane trace captured by profile_decode.py / profiler.
device_trace: per-fusion device time, bytes and bandwidth utilisation.

  python benchmarks/analyze_trace.py /tmp/ewt_trace [n_steps]
"""
import glob
import json
import sys


def device_total_ms(trace_dir: str):
    """Sum of per-program device time (ms) in a trace, IDLE excluded.

    The only trustworthy timing through the axon tunnel — wall clocks lie
    even for chained scans.  Returns {program_name: ms} plus '_total'."""
    xs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not xs:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(xs, "op_profile", {})
    data = json.loads(data)
    out = {}
    for prog in data["byProgram"].get("children") or []:
        name = prog.get("name", "?")
        t = (prog.get("metrics") or {}).get("rawTime", 0) / 1e9
        if name != "IDLE" and t:
            out[name] = out.get(name, 0.0) + t
    out["_total"] = sum(out.values())
    return out


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ewt_trace"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    xs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not xs:
        sys.exit(f"no xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(xs, "op_profile", {})
    data = json.loads(data)
    prog = data["byProgram"]

    # tree: byProgram -> program (depth 1) -> category (2) -> op group (3)
    # -> individual duplicates (4).  Record ONLY depth-3 op groups (a
    # group subsumes its duplicates); total from depth-1 programs so
    # category/op double counting is impossible.
    rows = []
    total = 0

    def walk(node, depth):
        nonlocal total
        m = node.get("metrics") or {}
        t = m.get("rawTime", 0)
        if depth == 1 and t and node.get("name") != "IDLE":
            total += t
        if depth == 3 and t:
            bw = (m.get("bandwidthUtils") or [0])[0]
            rows.append((t, node.get("name", "?"),
                         m.get("occurrences", 0),
                         sum(m.get("rawBytesAccessedArray", [0])), bw))
        if depth < 3:
            for c in node.get("children") or []:
                walk(c, depth + 1)

    walk(prog, 0)
    rows.sort(reverse=True)
    print(f"{'ms/step':>8} {'%':>5} {'occ':>6} {'MB/occ':>8} {'bw%':>5}  op")
    for t, name, occ, b, bw in rows[:25]:
        ms = t / 1e9 / n_steps
        mb = b / 2**20 / max(occ, 1)
        print(f"{ms:8.3f} {100 * t / total:5.1f} {occ:6d} {mb:8.2f} "
              f"{100 * bw:5.1f}  {name[:70]}")
    print(f"total device: {total / 1e9 / n_steps:.2f} ms/step "
          f"({n_steps} steps)")


if __name__ == "__main__":
    main()
