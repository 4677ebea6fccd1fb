#!/usr/bin/env python3
"""
Aggregate experiment results into a markdown table.

Walks a results prefix (default: benchmarks1_reproduction) for
metric.json files, groups seeds per configuration, and prints
mean/min/max rel-L2 — the summary the reference leaves to manual
spreadsheet work after its sweeps.

    python scripts/collect_results.py [prefix] [--csv out.csv]
"""
import argparse
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

SEED_RE = re.compile(r'_Seed\d+$')


def collect(prefix):
    groups = defaultdict(list)
    for root, _dirs, files in os.walk(prefix):
        if 'metric.json' not in files:
            continue
        run = os.path.basename(root)
        config = SEED_RE.sub('', run)
        operator = os.path.basename(os.path.dirname(root))
        try:
            m = json.load(open(os.path.join(root, 'metric.json')))['metrics']
        except Exception:
            continue
        groups[(operator, config)].append(m)
    return groups


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('prefix', nargs='?', default='benchmarks1_reproduction')
    ap.add_argument('--csv', default=None)
    ap.add_argument('--metric', default='rel_l2')
    args = ap.parse_args()

    groups = collect(args.prefix)
    if not groups:
        print(f"no metric.json under {args.prefix}", file=sys.stderr)
        sys.exit(1)

    rows = []
    for (operator, config), ms in sorted(groups.items()):
        vals = [m[args.metric] for m in ms if args.metric in m]
        if not vals:
            continue
        rows.append((operator, config, len(vals), float(np.mean(vals)),
                     float(np.min(vals)), float(np.max(vals))))

    print(f"| Operator | Configuration | seeds | {args.metric} mean "
          f"| min | max |")
    print("|---|---|---|---|---|---|")
    for op, cfg, n, mean, lo, hi in rows:
        print(f"| {op} | {cfg} | {n} | {mean:.4f} | {lo:.4f} | {hi:.4f} |")

    if args.csv:
        with open(args.csv, 'w') as f:
            f.write(f"operator,config,seeds,{args.metric}_mean,min,max\n")
            for r in rows:
                f.write(','.join(map(str, r)) + '\n')
        print(f"\nwrote {args.csv}", file=sys.stderr)


if __name__ == '__main__':
    main()
