#!/usr/bin/env python3
"""Empirical scaling audit: run graft.Bench at several scale factors and fit
a per-query scaling exponent.

Usage: python3 tools/scaling_check.py [sf_dir ...]
Defaults: sf0.01 sf0.1, plus target/scale/sf1.0 if it exists (generate it
with tools/make_scale.py) — the 3-point curve the 100x claims need
(VERDICT r7 #3): two points can hide a bend, three can't.

For each registered query, reports t ratios between consecutive scale
points against the data-size ratio. A linear-work query on 10x the data
costs <= ~10x (usually far less locally, since constant overheads dominate
at small SF); a query whose time ratio materially EXCEEDS the size ratio on
the LAST segment (where data dwarfs constants) is super-linear — the thing
that dies at 100 TB — and gets flagged. Local noise means single-run ratios
are indicative, not proof: re-run before believing a flag (see
bench_compare.py caveats). Writes SCALING.md with the table, plus the same
audit for the one-time staging builds (stage_detail) so a staging
regression is attributable per item (VERDICT r7 #1).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cache_path(sf_dir):
    label = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return os.path.join(REPO, "target", "scale", f"bench_{label}.json")


def run_bench(sf_dir, use_cache=False, only=None, stage_only=None):
    """One Bench run at sf_dir -> detail dict. Every run is cached to
    target/scale/bench_<sf>.json; --use-cache reuses an existing cache so a
    single contention-suspect point can be re-measured on a quiet machine
    and spliced with the clean points instead of re-running everything.
    `only`/`stage_only` restrict the run (the 100x deep points, where a
    full-suite run would spend ~an hour on queries whose curves are
    already pinned by the 3 standard points).
    """
    cp = cache_path(sf_dir)
    if use_cache and os.path.exists(cp):
        with open(cp) as f:
            return json.load(f)
    # inherit the caller's environment (JAVA_HOME, sbt opts, proxies, ...)
    # and override only the two graft knobs
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32")
    if only:
        env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(sorted(only))
    if stage_only is not None:
        env["SPARK_GRAFT_STAGE_ONLY"] = ",".join(sorted(stage_only)) or "none"
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=7200)
    for line in (out.stdout + out.stderr).splitlines():
        i = line.find('{"metric"')
        if i >= 0:
            parsed = json.loads(line[i:])
            # the printed line carries only headline queries; the full
            # per-query map lives in the detail file it points at
            detail = parsed.get("detail")
            if detail:
                with open(os.path.join(REPO, detail)) as f:
                    parsed = json.load(f)
            if only and os.path.exists(cp):
                # a restricted run (deep points / re-measurements) must MERGE
                # into the cache, not replace it — otherwise a second
                # restricted run silently drops the earlier points (ADVICE
                # r10). stage_detail merges too, and the headline total is
                # recomputed over the merged query set so SCALING.md's totals
                # line never reads a subset total as the suite total.
                with open(cp) as f:
                    old = json.load(f)
                for key in ("queries", "errors", "flaky", "stage_detail"):
                    merged = dict(old.get(key, {}))
                    merged.update(parsed.get(key, {}))
                    parsed[key] = merged
                parsed["value"] = round(sum(
                    t for t in parsed["queries"].values() if t > 0), 3)
                phases = dict(old.get("phases", parsed.get("phases", {})))
                phases["queries"] = parsed["value"]
                # stage total = merged top-level items (dot-keyed entries are
                # attribution INSIDE acid_txtable, not additional work)
                phases["stage"] = round(sum(
                    t for k, t in parsed["stage_detail"].items()
                    if "." not in k and t > 0), 3)
                parsed["phases"] = phases
            os.makedirs(os.path.dirname(cp), exist_ok=True)
            with open(cp, "w") as f:
                json.dump(parsed, f)
            return parsed
    raise RuntimeError(f"no bench line for {sf_dir}:\n{out.stdout[-2000:]}")


def sf_of(d):
    return float(d.rstrip("/").rsplit("sf", 1)[1])


def curve_rows(runs, key):
    """(name, [t0..tn], [r1..rn]) per entry of runs[i][1][key]; a None in the
    ratio list marks an unmeasurable segment (errored or 0.000-rounded)."""
    names = sorted(runs[0][1].get(key, {}))
    rows = []
    for q in names:
        ts = [r.get(key, {}).get(q) for _, r in runs]
        ratios = []
        for lo, hi in zip(ts, ts[1:]):
            if (lo is None or hi is None or lo < 0 or hi < 0 or lo == 0):
                # Bench reports a THROWN query as -1 (never a fast timing),
                # and serializes at %.3f so a sub-0.5ms timing rounds to
                # 0.000 — either way the segment has no meaningful ratio
                # (ADVICE r7)
                ratios.append(None)
            else:
                ratios.append(hi / lo)
        rows.append((q, ts, ratios))
    return rows


def fmt_t(t):
    return "—" if t is None or t < 0 else f"{t:.2f}"


def fmt_r(r):
    return "—" if r is None else f"{r:.1f}x"


DEEP_DIR = os.path.join(REPO, "target", "scale", "sf10.0")


def deep100(names, stage_items=()):
    """Targeted 4th scale point (VERDICT r9 #4): time ONLY `names` on the
    100x corpus (make_scale.py 100 -> target/scale/sf10.0). The stage phase
    runs only `stage_items` (default none — the original worst-decile
    scalers scan the corpus directly; pass --deep-stage a,b for queries
    that read staged tables, so their timings exclude the one-time build).
    Results cache to bench_sf10.0.json; the main SCALING.md writer appends
    the deep-point section whenever that cache exists. Timing-only by
    design: the all-pairs DuckDB twins are known-infeasible past 10x, so
    there is no oracle replay here.
    """
    if not os.path.isdir(DEEP_DIR):
        sys.exit(f"no 100x corpus at {DEEP_DIR}; run "
                 "`python3 tools/make_scale.py 100 /root/testdata/sf0.1 "
                 f"{DEEP_DIR}` first")
    detail = run_bench(DEEP_DIR, only=set(names), stage_only=set(stage_items))
    missing = set(names) - set(detail.get("queries", {}))
    if missing:
        sys.exit(f"deep100 queries not in bench detail: {sorted(missing)}")
    print("deep100 cached:", {q: detail["queries"][q] for q in sorted(names)})


def load_deep():
    """(names, detail) of the cached 100x deep point, or (None, None)."""
    cp = cache_path(DEEP_DIR)
    if not os.path.exists(cp):
        return None, None
    with open(cp) as f:
        detail = json.load(f)
    return sorted(detail.get("queries", {})), detail


def main():
    args = sys.argv[1:]
    use_cache = "--use-cache" in args
    if "--deep100" in args:
        stage_items = []
        if "--deep-stage" in args:
            j = args.index("--deep-stage")
            stage_items = [n for n in args[j + 1].split(",") if n]
            args = args[:j] + args[j + 2:]
        i = args.index("--deep100")
        deep100([n for n in args[i + 1].split(",") if n], stage_items)
        args = args[:i] + args[i + 2:]
        if not args:
            args = ["--use-cache"]  # refresh SCALING.md from cached points
            use_cache = True
    dirs = [a for a in args if a != "--use-cache"]
    if not dirs:
        dirs = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
        sf1 = os.path.join(REPO, "target", "scale", "sf1.0")
        # the sf1.0 point joins the default set when EITHER the corpus or
        # its cached bench exists — a bare `--deep100` refresh (use_cache)
        # must not silently drop to the two-dir set, or the deep table's
        # t(sf1) column would hold the sf0.1 timing and r3 would be computed
        # over a 100x segment against the 10x threshold (ADVICE r10, medium)
        if os.path.isdir(sf1) or os.path.exists(cache_path(sf1)):
            dirs.append(sf1)
    runs = [(d, run_bench(d, use_cache)) for d in dirs]
    sfs = [sf_of(d) for d in dirs]
    seg_ratios = [b / a for a, b in zip(sfs, sfs[1:])]

    rows = curve_rows(runs, "queries")
    # flag on the LAST measurable segment: it has the least constant-cost
    # dilution, so it is the best local predictor of the next decade
    def last_seg(r):
        meas = [(i, x) for i, x in enumerate(r[2]) if x is not None]
        return meas[-1] if meas else None
    flagged, errors = [], []
    for r in rows:
        ls = last_seg(r)
        if ls is None:
            errors.append(r)
        elif ls[1] > seg_ratios[ls[0]]:
            flagged.append(r)
    rows.sort(key=lambda r: -(last_seg(r)[1] if last_seg(r) else -1))

    stage_rows = curve_rows(runs, "stage_detail")
    stage_rows.sort(key=lambda r: -(last_seg(r)[1] if last_seg(r) else -1))
    stage_flagged = [r for r in stage_rows
                     if last_seg(r) and last_seg(r)[1] > seg_ratios[last_seg(r)[0]]]

    totals = [r.get("value", 0.0) for _, r in runs]
    stage_totals = [r.get("phases", {}).get("stage") for _, r in runs]
    hdr_t = " | ".join(f"t(sf{s:g}) s" for s in sfs)
    hdr_r = " | ".join(f"r{i+1} (≤{seg_ratios[i]:.0f}x)"
                       for i in range(len(seg_ratios)))

    def table(f, rs):
        f.write(f"| query | {hdr_t} | {hdr_r} | |\n")
        f.write("|---" * (1 + len(sfs) + len(seg_ratios) + 1) + "|\n")
        for q, ts, ratios in rs:
            ls = last_seg((q, ts, ratios))
            mark = "**FLAG**" if ls and ls[1] > seg_ratios[ls[0]] else ""
            f.write(f"| {q} | " + " | ".join(fmt_t(t) for t in ts) + " | "
                    + " | ".join(fmt_r(r) for r in ratios) + f" | {mark} |\n")

    with open(os.path.join(REPO, "SCALING.md"), "w") as f:
        f.write("# SCALING — empirical per-query scaling audit\n\n")
        f.write("Generated by `tools/scaling_check.py`: one `graft.Bench` run at each of "
                + ", ".join(f"`{d}`" for d in dirs)
                + f" (segment data-size ratios {', '.join(f'{r:.0f}x' for r in seg_ratios)}; "
                "the sf1.0 point is a deterministic 10x corpus from `tools/make_scale.py`).\n"
                "`rK` = t(point K+1)/t(point K); a query materially above the segment's size "
                "ratio on its LAST measurable segment is super-linear and flagged. Single "
                "runs — treat flags as leads, not verdicts (local noise can be 2-5x on "
                "individual queries). A 3-point curve that stays sub-linear on BOTH segments "
                "is the empirical 100x-credibility check.\n\n")
        f.write("Totals: " + " -> ".join(f"{t:.1f}s" for t in totals)
                + f". Flagged {len(flagged)}/{len(rows)}; "
                f"{len(errors)} unmeasurable (errored/too-fast at every segment).\n\n")
        if errors:
            f.write("Unmeasurable queries (Bench reported failure or 0.000 at some SF):\n\n")
            for q, ts, _ in errors:
                f.write(f"- `{q}` ({', '.join(fmt_t(t) for t in ts)})\n")
            f.write("\n")
        table(f, rows)
        deep_names, deep_detail = load_deep()
        if deep_names:
            # r3 denominators MUST come from the sf1.0 run, never runs[-1]
            # blindly — if the dir set lacks the 10x point, abort instead of
            # writing a table whose "t(sf1)" is sf0.1 (ADVICE r10, medium)
            sf1_runs = [r for d, r in runs if abs(sf_of(d) - 1.0) < 1e-9]
            if not sf1_runs:
                sys.exit("deep-point section needs the sf1.0 run in the dir "
                         "set (generate target/scale/sf1.0 with make_scale.py "
                         "or keep its cache); refusing to write a mislabeled "
                         "deep table")
            sf1_run = sf1_runs[0]
            # targeted 4th point (VERDICT r9 #4): worst-decile scalers only,
            # timing-only (all-pairs oracle twins are infeasible past 10x)
            f.write("\n## 100x deep points (timing-only, worst-decile scalers)\n\n"
                    "One `graft.Bench` run at `target/scale/sf10.0` (a 100x "
                    "sf0.1 corpus from `tools/make_scale.py 100`), restricted "
                    "to the queries whose r2 ratio led the table above plus "
                    "the top bench-cost and newest queries; staging is "
                    "restricted to the probed queries' own staged tables "
                    "(`--deep-stage`), and there is no oracle replay (the "
                    "quadratic DuckDB twins are documented-infeasible past "
                    "10x). `r3` = t(100x)/t(10x) against the segment's 10x "
                    "size ratio — the direct check that the steep r2 ratios "
                    "were constant-cost dilution ending, not a super-linear "
                    "bend. Flags here are adjudicated by a like-for-like "
                    "re-run on a quiet session: a 100x staged build earlier "
                    "in the same JVM can inflate later timings by tens of "
                    "percent.\n\n")
            f.write("| query | t(sf1) s | t(sf10) s | r3 (≤10x) | |\n")
            f.write("|---|---|---|---|---|\n")
            deep_flagged = []
            for q in deep_names:
                t10 = sf1_run.get("queries", {}).get(q)
                t100 = deep_detail["queries"].get(q)
                r3 = (t100 / t10) if (t10 and t100 and t10 > 0 and t100 > 0) \
                    else None
                mark = "**FLAG**" if r3 is not None and r3 > 10.0 else ""
                if mark:
                    deep_flagged.append(q)
                f.write(f"| {q} | {fmt_t(t10)} | {fmt_t(t100)} | "
                        f"{fmt_r(r3)} | {mark} |\n")
            f.write(f"\nDeep-point flags: {len(deep_flagged)}/"
                    f"{len(deep_names)}.\n")
        f.write("\n## Staging builds (one-time per session; `stage_detail`)\n\n")
        if all(s is not None for s in stage_totals):
            f.write("Stage-phase totals: "
                    + " -> ".join(f"{s:.1f}s" for s in stage_totals)
                    + f". Flagged {len(stage_flagged)}/{len(stage_rows)}.\n\n")
        table(f, stage_rows)
    print(f"wrote SCALING.md: {len(flagged)} flagged of {len(rows)} queries, "
          f"{len(stage_flagged)} of {len(stage_rows)} staging items "
          f"(totals {' -> '.join(f'{t:.1f}s' for t in totals)})")
    for q, ts, ratios in flagged + stage_flagged:
        print(f"  FLAG {q}: {' -> '.join(fmt_t(t) for t in ts)} "
              f"({' , '.join(fmt_r(r) for r in ratios)})")


if __name__ == "__main__":
    main()
