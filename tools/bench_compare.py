"""Diff two bench result files (BENCH_r{N}.json or raw bench.py output):
per-query deltas, movers beyond a threshold, and subset totals over the
shared queries — the round-over-round comparison VERDICT reviews do by
hand, with the host-noise guidance built in.

Usage: python tools/bench_compare.py OLD NEW [threshold_pct]

Accepts either the driver's BENCH_r{N}.json wrapper (reads
``parsed.queries``) or a file containing bench.py's single JSON line.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    text = open(path).read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        line = [l for l in text.splitlines() if l.strip().startswith('{"metric"')][-1]
        doc = json.loads(line)
    if "parsed" in doc:
        doc = doc["parsed"]
    if "queries" not in doc:
        raise SystemExit(f"{path}: no 'queries' key found")
    return doc["queries"]


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0

    shared = sorted(set(old) & set(new))
    o_tot = sum(old[k] for k in shared)
    n_tot = sum(new[k] for k in shared)
    print(
        f"shared queries: {len(shared)}  old subtotal {o_tot:.1f}s  "
        f"new subtotal {n_tot:.1f}s  ({(n_tot - o_tot) / o_tot * 100:+.1f}%)"
    )
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"dropped: {only_old}")
    if only_new:
        print(f"added ({sum(new[k] for k in only_new):.1f}s): {only_new}")

    movers = [
        (new[k] - old[k], (new[k] - old[k]) / old[k] * 100, k)
        for k in shared
        if old[k] > 0 and abs(new[k] - old[k]) / old[k] * 100 >= thresh
        and abs(new[k] - old[k]) >= 0.2
    ]
    if movers:
        print(f"\nmovers beyond ±{thresh:.0f}% (and ±0.2s):")
        for dabs, dpct, k in sorted(movers):
            print(f"  {k:40s} {old[k]:7.2f} -> {new[k]:7.2f}  ({dpct:+.0f}%)")
        print(
            "\nNOTE: single-row spikes on an otherwise-flat sheet are the "
            "documented host-load signature (BASELINE.md) — re-run on an "
            "idle machine before treating any row as a plan regression."
        )
    else:
        print(f"no movers beyond ±{thresh:.0f}%")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. `| head`
        pass
