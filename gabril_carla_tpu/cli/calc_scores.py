"""Score aggregation over a stats.json tree (eval/calc_scores.py:8-60 parity)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from ..eval.stats import aggregate_scores


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--stats_dir", required=True)
    args = p.parse_args(argv)
    records = []
    for f in sorted(Path(args.stats_dir).glob("route_*/seed_*/stats.json")):
        records.append(json.loads(f.read_text()))
    if not records:
        print("no stats.json found under", args.stats_dir)
        return 1
    agg = aggregate_scores(records)
    print(json.dumps(agg, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
