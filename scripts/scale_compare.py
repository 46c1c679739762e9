#!/usr/bin/env python3
"""Compare two bench_detail.json runs (e.g. sf0.1 vs a ScaleGen sf1
replica) and flag super-linear scalers.

Usage: scale_compare.py BASE.json SCALED.json DATA_RATIO

A query whose cold-time ratio exceeds DATA_RATIO is scaling worse than
linearly in the data (after subtracting nothing for fixed overhead, so
small absolute times are noisy — the report includes absolute seconds to
judge that). Exits 0 always; this is a report, not a gate.
"""
import json
import sys


def cold(detail):
    d = json.load(open(detail))
    # detail schema: queries_cold/queries_warm maps + errors map
    return d["queries_cold"], d.get("errors", {})


def main():
    args = [a for a in sys.argv[1:] if a != "--markdown"]
    markdown = "--markdown" in sys.argv
    base_f, scaled_f, ratio = args[0], args[1], float(args[2])
    base, berr = cold(base_f)
    scaled, serr = cold(scaled_f)
    rows = []
    for q, b in base.items():
        s = scaled.get(q)
        if s is None or b is None or b <= 0 or s <= 0:
            rows.append((float("inf"), q, b, s))
            continue
        rows.append((s / b, q, b, s))
    rows.sort(reverse=True)
    if markdown:
        # the SCALE.md per-query ratio table (r15, verdict item 4):
        # super-linear tails surface automatically at the top
        print("| query | sf_base cold | sf_scaled cold | ratio | flag |")
        print("|---|---|---|---|---|")
        for r, q, b, s in rows:
            flag = ""
            if r == float("inf"):
                flag = "ERR/missing"
            elif r > 4:
                flag = "**>4x at 10x data — explain or fix**"
            elif r > ratio:
                flag = "super-linear"
            elif r > ratio * 0.7:
                flag = "near-linear"
            print(f"| {q} | {b} s | {s} s | {r:.2f}x | {flag} |")
        return
    print(f"{'query':34s} {'base_s':>8s} {'scaled_s':>9s} {'ratio':>7s}  flag")
    for r, q, b, s in rows:
        flag = ""
        if r == float("inf"):
            flag = "ERR/missing"
        elif r > ratio:
            flag = f"SUPER-LINEAR (> {ratio:g}x data)"
        elif r > ratio * 0.7:
            flag = "near-linear"
        print(f"{q:34s} {b!s:>8s} {s!s:>9s} {r:7.2f}  {flag}")
    if berr or serr:
        print("errors base:", berr, "scaled:", serr)


if __name__ == "__main__":
    main()
