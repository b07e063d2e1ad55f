#!/usr/bin/env python
"""Summarise suite logs into one table (run after r2/r3_tpu_suite.sh):
``python benchmarks/r2_suite_summary.py [/tmp/r3suite]``."""
import glob
import json
import os
import re
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r2suite"
for f in sorted(glob.glob(os.path.join(OUT, "*.log"))):
    name = os.path.basename(f)[:-4]
    txt = open(f, errors="replace").read()
    js = [l for l in txt.splitlines() if l.startswith('{"metric"')]
    bench = [l for l in txt.splitlines() if "[BENCHMARK]" in l]
    stage = [l for l in txt.splitlines() if "decode-loop" in l]
    us = re.findall(r"\[(\w+)\] ([\d.]+) us/layer", txt)
    print(f"== {name}")
    for l in stage[-1:]:
        print("  ", l.strip())
    for l in js[-1:]:
        d = json.loads(l)
        print(f"   {d['value']} {d['unit']} ({d['vs_baseline']}x)")
    for l in bench:
        print("  ", l.strip()[:140])
    for v, u in us:
        print(f"   {v}: {u} us/layer")
