"""Compare two bench artifacts (the driver's BENCH_r{N}.json or local
BENCH_LOCAL.json runs) on their COMMON query set — the same analysis the
per-round review does by hand: common-set totals, the distribution of
per-query ratios, and the biggest movers in both directions.

Usage: python tools/bench_diff.py OLD.json NEW.json [--top N] [--threshold R]

Exit code 1 if the common-set ratio exceeds --threshold (default 2.0, the
regression bar), so the tool doubles as a pre-commit bench gate:

    python bench.py > /tmp/bench_new.json && \
    python tools/bench_diff.py BENCH_LOCAL.json /tmp/bench_new.json
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict[str, float]:
    """Accepts both shapes: bench.py's own JSON line (queries at top level)
    and the driver's BENCH_r{N}.json wrapper (under "parsed"; note the
    driver TRUNCATES the per-query map — see parsed.queries_omitted — so
    driver-vs-driver diffs cover only the retained slice)."""
    with open(path) as f:
        doc = json.load(f)
    if "queries" not in doc and isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    return doc.get("queries", {})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=8)
    ap.add_argument("--threshold", type=float, default=2.0)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    common = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))

    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    ratio = t_new / t_old if t_old else float("inf")
    print(
        f"common set: {len(common)} queries  "
        f"{t_old:.1f}s -> {t_new:.1f}s  (x{ratio:.3f})"
    )
    if only_old:
        print(f"dropped ({len(only_old)}): {' '.join(only_old)}")
    if only_new:
        print(f"added ({len(only_new)}): {' '.join(only_new)}")

    movers = sorted(
        (
            (new[q] / old[q], q)
            for q in common
            # sub-100ms queries are scheduling noise, not plans
            if old[q] >= 0.1 and new[q] >= 0.1
        ),
        key=lambda rq: rq[0],
    )
    if movers:
        print(f"\nslowed most (of {len(movers)} >=0.1s):")
        for r, q in movers[: -args.top - 1 : -1]:
            print(f"  x{r:5.2f}  {old[q]:7.3f} -> {new[q]:7.3f}  {q}")
        print("sped up most:")
        for r, q in movers[: args.top]:
            print(f"  x{r:5.2f}  {old[q]:7.3f} -> {new[q]:7.3f}  {q}")

    return 1 if ratio > args.threshold else 0


if __name__ == "__main__":
    sys.exit(main())
