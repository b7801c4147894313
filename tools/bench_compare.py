#!/usr/bin/env python3
"""Compare two graft.Bench JSON outputs per-query.

Usage: python3 tools/bench_compare.py BENCH_A.json BENCH_B.json [--top N]

Prints the common-query sums (the only honest round-over-round total: new
queries inflate raw totals) and the biggest per-query ratios in both
directions. Remember the operational caveat (memory/bench notes): a run
launched right after another heavy JVM exits can be uniformly 1.5-5x slower
with zero code change — before believing a regression, re-run on an idle
box (load < ~1) and compare per-query, not totals.
"""
import json
import os
import sys


def load(path):
    with open(path) as f:
        txt = f.read()
    # tolerate a bare JSON line or sbt-prefixed capture
    start = txt.index('{"metric"')
    d = json.loads(txt[start:txt.index("}\n", start) + 1] if "}\n" in txt[start:] else txt[start:])
    # follow the detail pointer (full per-query map) when it resolves
    detail = d.get("detail")
    if detail:
        for cand in (detail, os.path.join(os.path.dirname(os.path.abspath(path)), detail)):
            if os.path.exists(cand):
                with open(cand) as f:
                    return json.load(f)
    return d


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 10
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    a, b = load(args[0]), load(args[1])
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    only_a, only_b = sorted(set(qa) - set(qb)), sorted(set(qb) - set(qa))
    sa, sb = sum(qa[q] for q in common), sum(qb[q] for q in common)
    print(f"A: {args[0]}  total={a['value']:.1f}s  n={len(qa)}  phases={a.get('phases')}")
    print(f"B: {args[1]}  total={b['value']:.1f}s  n={len(qb)}  phases={b.get('phases')}")
    print(f"\ncommon queries: {len(common)}   sum A={sa:.1f}s  sum B={sb:.1f}s  "
          f"B/A={sb / sa:.2f}x")
    if only_a:
        print(f"only in A ({len(only_a)}): {', '.join(only_a)}")
    if only_b:
        print(f"only in B ({len(only_b)}): {', '.join(only_b)}")
    ratios = sorted(((qb[q] / max(qa[q], 1e-9), q) for q in common), reverse=True)
    print(f"\nworst B/A ratios (B regressed):")
    for r, q in ratios[:top]:
        print(f"  {r:6.2f}x  {qa[q]:7.2f}s -> {qb[q]:7.2f}s  {q}")
    print(f"\nbest B/A ratios (B improved):")
    for r, q in ratios[-top:]:
        print(f"  {r:6.2f}x  {qa[q]:7.2f}s -> {qb[q]:7.2f}s  {q}")


if __name__ == "__main__":
    main()
