"""Compare two bench --only runs (sf0.1 vs a make_scale_fixture sibling)
and emit the SCALE.md scaling table (VERDICT r06 #1).

For each query: wall-clock at both scales and the empirical scaling
exponent e = log(t_big / t_small) / log(factor) — e <= 1 is at-or-below
linear, e > 1 superlinear (gets a named cause and a fix or a documented
cap in SCALE.md). Single-sample runs swing +-10-20% on this box
(BENCH_NOTES), which at factor 10 shifts e by +-0.08 — exponents are
read in bands (sublinear / ~linear / superlinear), not decimals.

Usage:
    python tools/scale_rehearsal.py .scale_sf01_detail.json \
        .scale_sf1_detail.json --factor 10
"""

import argparse
import json
import math


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("small")
    ap.add_argument("big")
    ap.add_argument("--factor", type=float, default=10.0)
    args = ap.parse_args()
    small = json.load(open(args.small))["queries"]
    big = json.load(open(args.big))["queries"]
    rows = []
    for name in sorted(small, key=lambda n: -big.get(n, 0)):
        if name not in big:
            continue
        t0, t1 = small[name], big[name]
        e = math.log(t1 / t0) / math.log(args.factor)
        rows.append((name, t0, t1, e))
    print("| query | sf0.1 s | sf1 s | ratio | exponent |")
    print("|---|---|---|---|---|")
    for name, t0, t1, e in rows:
        print(
            f"| {name} | {t0:.2f} | {t1:.2f} | {t1 / t0:.1f}x | {e:.2f} |"
        )
    tot0 = sum(small[n] for n, *_ in [(r[0],) for r in rows])
    tot1 = sum(big[r[0]] for r in rows)
    print(
        f"\ntotal: {tot0:.1f}s -> {tot1:.1f}s "
        f"(ratio {tot1 / tot0:.1f}x, exponent "
        f"{math.log(tot1 / tot0) / math.log(args.factor):.2f})"
    )


if __name__ == "__main__":
    main()
