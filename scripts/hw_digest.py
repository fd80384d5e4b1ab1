#!/usr/bin/env python
"""Digest a scripts/hw_queue.sh log directory into per-step result tables.

Scans <log_dir>/*.log for the one-line JSON records the benchmarks emit
({"metric": ...}), groups repeats of the same step stem (trailing _<n>
stripped), and prints mean / spread per (step, metric) — the interleaved
A/B repeats are the unit of evidence (tunnel throughput drifts +-10%).

Usage: python scripts/hw_digest.py [/tmp/hwq]
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import defaultdict


def main():
    log_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hwq"
    rows = defaultdict(list)   # (step_stem, metric) -> [(value, frame_ms)]
    order = []
    for name in sorted(os.listdir(log_dir)):
        if not name.endswith(".log") or name == "queue.log":
            continue
        stem = re.sub(r"_\d+$", "", name[:-4])
        for line in open(os.path.join(log_dir, name), errors="replace"):
            line = line.strip()
            if not (line.startswith("{") and '"metric"' in line):
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            key = (stem, rec.get("metric", "?"))
            if key not in rows:
                order.append(key)
            rows[key].append((rec.get("value"), rec.get("frame_ms")))
    if not rows:
        print(f"no JSON result lines under {log_dir}", file=sys.stderr)
        return 1
    print(f"{'step':<28}{'metric':<40}{'n':>3}{'mean':>10}"
          f"{'min':>10}{'max':>10}")
    for step, metric in order:
        vals = [v for v, _ in rows[(step, metric)] if v is not None]
        if not vals:
            continue
        print(f"{step:<28}{metric:<40}{len(vals):>3}"
              f"{sum(vals) / len(vals):>10.2f}"
              f"{min(vals):>10.2f}{max(vals):>10.2f}")
    # step exit codes from the queue log, for spotting timeouts/failures
    qlog = os.path.join(log_dir, "queue.log")
    if os.path.exists(qlog):
        bad = [ln.strip() for ln in open(qlog, errors="replace")
               if " END " in ln and not ln.strip().endswith("rc=0")]
        if bad:
            print("\nnon-zero steps:")
            for ln in bad:
                print(" ", ln)
    return 0


if __name__ == "__main__":
    sys.exit(main())
