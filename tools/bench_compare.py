"""Compare two bench artifacts and flag per-query regressions.

The round driver's BENCH_r{N}.json archives truncate stdout, so
round-over-round comparison used to require regex archaeology; bench.py
now writes the complete per-query artifact (bench_results.json), and this
tool diffs two of them:

    python tools/bench_compare.py old.json new.json [--threshold 2.0]

Both artifacts may carry a ``calib_sec`` field (the self-calibration
probe bench.py runs to detect host-speed oscillation); when both have
one, per-query ratios are normalized by the calibration ratio so a
globally slower host doesn't read as a regression.

Exit code 1 when any common query regressed beyond the threshold —
usable as a local gate before committing operator changes.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument(
        "--min-sec",
        type=float,
        default=0.3,
        help="ignore queries faster than this in BOTH runs (noise floor)",
    )
    args = ap.parse_args()

    old = json.load(open(args.old))
    new = json.load(open(args.new))
    oq, nq = old["queries"], new["queries"]

    host = 1.0
    if old.get("calib_sec") and new.get("calib_sec"):
        host = new["calib_sec"] / old["calib_sec"]
        print(f"host-speed normalization: {host:.3f}x")
    # per-query calibration beats the global factor when both artifacts
    # carry it: bench.py interleaves a fixed probe between queries, so a
    # transient load spike during one stretch of the run shows up in that
    # stretch's calib values and is divided back out here
    ocal, ncal = old.get("query_calib") or {}, new.get("query_calib") or {}

    common = sorted(set(oq) & set(nq))
    gone, added = sorted(set(oq) - set(nq)), sorted(set(nq) - set(oq))
    regressed = []
    improved = []
    for q in common:
        o, n = oq[q], nq[q]
        if o < args.min_sec and n < args.min_sec:
            continue
        f = (
            ncal[q] / ocal[q]
            if q in ocal and q in ncal and ocal[q] > 0
            else host
        )
        ratio = (n / f) / o if o > 0 else float("inf")
        if ratio >= args.threshold:
            regressed.append((ratio, q, o, n))
        elif ratio <= 1 / args.threshold:
            improved.append((ratio, q, o, n))

    tot_o = sum(oq[q] for q in common)
    tot_n = sum(nq[q] for q in common)
    print(
        f"common queries: {len(common)}  total {tot_o:.1f}s -> {tot_n:.1f}s "
        f"({(tot_n / host) / tot_o:.2f}x host-normalized)"
    )
    for ratio, q, o, n in sorted(improved):
        print(f"  IMPROVED  {q:32s} {o:7.2f}s -> {n:7.2f}s  ({ratio:.2f}x)")
    for ratio, q, o, n in sorted(regressed, reverse=True):
        print(f"  REGRESSED {q:32s} {o:7.2f}s -> {n:7.2f}s  ({ratio:.2f}x)")
    if added:
        print(f"new queries ({len(added)}): {', '.join(added)}")
    if gone:
        print(f"removed queries ({len(gone)}): {', '.join(gone)}")
    if not regressed:
        print("no regressions beyond threshold")
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
