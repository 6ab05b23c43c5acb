#!/usr/bin/env python3
"""Per-query bench regression guard.

Diffs the latest Bench per-query map against a previous run and fails
(exit 1) on genuine per-query regressions, while staying quiet about
whole-host noise: the documented +/-20-30% regime (BASELINE.md) shifts
EVERY query together, so raw ratios are normalized by the run's median
ratio before anything is flagged.

Usage:
    python3 tools/bench_regress.py check PREV LATEST [--record OUT]
    python3 tools/bench_regress.py selftest

PREV and LATEST each accept any of:
  - raw Bench stdout (the file a local `runMain graft.Bench | tee ...` left),
  - a driver BENCH_r{N}.json (the per-query lines are recovered from its
    "tail" field),
  - a file this tool previously wrote with --record ({"queries": {...}}).

Flag rule (all three must hold, so tiny/noisy queries can't fail a run):
  - the query took >= MIN_PREV seconds in the previous run,
  - its noise-normalized ratio (new/old divided by the median new/old of
    the OTHER queries — the candidate is excluded from its own yardstick)
    exceeds RATIO,
  - it regressed by >= MIN_ABS seconds absolute.

Two complementary TOTAL guards bound what per-query normalization cannot
see. Median-normalization is mathematically blind to a UNIFORM build
slowdown (if every query gets ~f x slower, the median ratio is ~f and
dividing by it cancels the regression exactly), so:
  - the normalizing median is CLAMPED to NOISE_CEILING before the
    adjusted-total check — host noise can plausibly shift all queries by
    up to ~30% (BASELINE.md regime), but a median ratio beyond that is
    treated as a build property, not noise, and is NOT divided away;
  - the RAW common-query total must stay within RAW_TOTAL_RATIO of the
    previous run — an unconditional backstop sized above the noise band.

KNOWN DEAD ZONE, by construction: a uniform slowdown in the
(NOISE_CEILING, RAW_TOTAL_RATIO] band — e.g. every query 1.35x — is
indistinguishable from one noisy host sample and exits 0. No single-run
rule can separate the two (the documented noise regime itself reaches
~1.3x); the guard instead prints a TOTAL AMBIGUOUS warning for that band
so a human re-measures (Scratch x3) instead of trusting either verdict.

The same ceiling clamps each query's leave-one-out yardstick: a query is
never excused by peers that are themselves slower than plausible host
noise, so 2-of-3 co-regressed queries cannot alibi each other.

Exit codes: 0 clean, 1 regressions found, 2 input error.
"""

import json
import re
import statistics
import sys

RATIO = 1.5          # normalized-ratio threshold (the verdict's 1.5x median)
MIN_PREV = 0.2       # seconds: ignore queries too small to measure reliably
MIN_ABS = 0.3        # seconds: ignore sub-noise absolute drift
TOTAL_RATIO = 1.2    # clamped-median-adjusted common total must stay within 20%
NOISE_CEILING = 1.3  # documented +/-20-30% host band (BASELINE.md); a median
                     # ratio above this is a build slowdown, not host noise
RAW_TOTAL_RATIO = 1.45  # raw common total backstop, sized above the noise band
TOTAL_MIN_ABS = 3.0  # seconds: total guards need this much absolute growth —
                     # the MIN_ABS idea applied to totals, so a run of only
                     # tiny queries can't trip a ratio on sub-noise seconds
MIN_SIZABLE = 3      # below this, leave-one-out medians are self-referential
                     # (N=1: the fallback IS the candidate's own ratio; N=2:
                     # each is judged solely against the other) — use an
                     # unnormalized raw-ratio check instead


def extract_queries(path):
    """Best per-query map recoverable from any supported file shape."""
    with open(path) as f:
        text = f.read()
    # driver BENCH_r{N}.json: the bench stdout lives in its "tail" field
    try:
        obj = json.loads(text)
        if isinstance(obj, dict) and "tail" in obj:
            text = obj["tail"]
        elif isinstance(obj, dict) and "queries" in obj:
            return dict(obj["queries"]), obj.get("total")
    except ValueError:
        pass
    # bench stdout: prefer the complete queries_all line; merge in the
    # headline map from the total line (it survives tail truncation)
    queries, total = {}, None
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if isinstance(obj, dict) and isinstance(obj.get("queries"), dict):
            queries.update(obj["queries"])
            if obj.get("metric") == "total":
                total = obj.get("value")
    if not queries:
        # truncated tail: the queries_all line lost its head — recover
        # whatever "name":seconds pairs are still visible
        for name, secs in re.findall(r'"(q_[a-z0-9_]+)":([0-9.]+)', text):
            queries[name] = float(secs)
    return queries, total


def selftest():
    """Synthetic cases pinning the guard's failure modes (exit 0 = all hold).

    Each case is (name, prev map, latest map, expected exit). They encode
    the r6 advice findings so a future edit can't silently reopen them:
    uniform slowdowns must FAIL despite median normalization, small-N runs
    must not judge a query against itself, and plain host noise must PASS.
    """
    import os
    import tempfile
    cases = [
        ("uniform 1.6x slowdown fails (raw + clamped-median guards)",
         {f"q_{i}": 1.0 for i in range(20)},
         {f"q_{i}": 1.6 for i in range(20)}, 1),
        ("uniform 1.35x (dead zone): passes but prints TOTAL AMBIGUOUS",
         {f"q_{i}": 1.0 for i in range(20)},
         {f"q_{i}": 1.35 for i in range(20)}, 0, "TOTAL AMBIGUOUS"),
        ("uniform 1.25x host noise passes (inside the noise band)",
         {f"q_{i}": 1.0 for i in range(20)},
         {f"q_{i}": 1.25 for i in range(20)}, 0),
        ("one query 3x with 2 sizable peers: small-N fallback flags it",
         {"q_a": 1.0, "q_b": 1.0, "q_c": 0.05},
         {"q_a": 3.0, "q_b": 1.0, "q_c": 0.05}, 1),
        ("single sizable query 3x: cannot hide in its own median",
         {"q_a": 1.0, "q_c": 0.05},
         {"q_a": 3.0, "q_c": 0.05}, 1),
        ("one query 2x among 20 steady: leave-one-out median flags it",
         {f"q_{i}": 1.0 for i in range(20)},
         {**{f"q_{i}": 1.0 for i in range(20)}, "q_0": 2.0}, 1),
        ("2 of 3 sizable co-regressed 3x: clamped yardstick flags them",
         {"q_a": 0.5, "q_b": 0.5, "q_c": 0.5},
         {"q_a": 1.5, "q_b": 1.5, "q_c": 0.5}, 1),
        ("all queries 10% faster: passes",
         {f"q_{i}": 1.0 for i in range(20)},
         {f"q_{i}": 0.9 for i in range(20)}, 0),
        # isolates the LEAVE-ONE-OUT: with even-N ratios (1.6, 1.3, 1.0,
        # 1.0) the candidate's own 1.6 would average into a self-median
        # of 1.15 and excuse itself (1.6/1.15 = 1.39 < RATIO); excluded,
        # the yardstick is 1.0 and the flag fires. Totals stay under
        # TOTAL_MIN_ABS so only the per-query rule is in play
        ("1.6x candidate among (1.3, 1.0, 1.0) peers: own ratio must not "
         "enter its yardstick",
         {"q_a": 1.0, "q_b": 1.0, "q_c": 1.0, "q_d": 1.0},
         {"q_a": 1.6, "q_b": 1.0, "q_c": 1.0, "q_d": 1.3}, 1),
        # isolates the ADJUSTED-total guard AND the median (vs mean)
        # host-speed estimate: 9 of 20 queries at 1.45x sit below the
        # per-query RATIO, the raw total (1.20x) is under the backstop,
        # and the true median is 1.0 — only adj_total catches it. A
        # mean-based estimate (1.20) would divide the regression away
        ("9 of 20 at 1.45x: adjusted-total guard fires on the true median",
         {f"q_{i}": 1.0 for i in range(20)},
         {**{f"q_{i}": 1.0 for i in range(20)},
          **{f"q_{i}": 1.45 for i in range(9)}}, 1),
        # isolates the RAW backstop: at uniform 1.5x the clamped-median
        # total stays under TOTAL_RATIO (1.5/1.3 = 1.15) and per-query
        # norms sit at 1.15 — ONLY raw_regressed can fail this run, so
        # deleting the backstop is caught here and nowhere else
        ("uniform 1.5x fails via the raw backstop alone",
         {f"q_{i}": 1.0 for i in range(20)},
         {f"q_{i}": 1.5 for i in range(20)}, 1),
        # isolates MIN_ABS: 2.16x ratio on a sizable-but-small query with
        # +0.29s absolute growth must stay quiet — dropping the absolute
        # gate would flag every small query in a jittery window
        ("sub-MIN_ABS drift at 2x ratio on a small sizable query: passes",
         {"q_a": 0.25, "q_b": 1.0, "q_c": 1.0},
         {"q_a": 0.54, "q_b": 1.0, "q_c": 1.0}, 0),
        ("tiny-query drift among steady peers: ignored (MIN_PREV/MIN_ABS)",
         {**{f"q_{i}": 0.05 for i in range(20)},
          **{f"s_{i}": 1.0 for i in range(10)}},
         {**{f"q_{i}": 0.15 for i in range(20)},
          **{f"s_{i}": 1.0 for i in range(10)}}, 0),
    ]
    failures = 0
    for case in cases:
        name, prev, latest, expected = case[:4]
        marker = case[4] if len(case) > 4 else None
        with tempfile.TemporaryDirectory() as d:
            pp, lp = os.path.join(d, "p.json"), os.path.join(d, "l.json")
            with open(pp, "w") as f:
                json.dump({"queries": prev}, f)
            with open(lp, "w") as f:
                json.dump({"queries": latest}, f)
            import io
            import contextlib
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                got = main(["bench_regress.py", "check", pp, lp])
        ok = got == expected and (marker is None or marker in buf.getvalue())
        failures += 0 if ok else 1
        print(f"  {'PASS' if ok else 'FAIL'} {name} "
              f"(exit {got}, expected {expected}"
              f"{'' if marker is None else ', marker ' + repr(marker)})")
    print(f"selftest: {len(cases) - failures}/{len(cases)} cases hold")
    return 1 if failures else 0


def main(argv):
    if len(argv) == 2 and argv[1] == "selftest":
        return selftest()
    if len(argv) < 4 or argv[1] != "check":
        print(__doc__)
        return 2
    prev_path, latest_path = argv[2], argv[3]
    record = argv[5] if len(argv) > 5 and argv[4] == "--record" else None

    prev, _ = extract_queries(prev_path)
    latest, latest_total = extract_queries(latest_path)
    if not prev or not latest:
        print(f"could not extract per-query maps ({len(prev)} prev / "
              f"{len(latest)} latest entries)")
        return 2

    common = sorted(set(prev) & set(latest))
    ratios = {q: latest[q] / prev[q] for q in common if prev[q] > 0}
    sizable = {q: r for q, r in ratios.items() if prev[q] >= 0.1}
    med = statistics.median(sizable.values()) if sizable else 1.0

    flagged = []
    for q in common:
        if q not in ratios or prev[q] < MIN_PREV:
            continue
        if len(sizable) < MIN_SIZABLE:
            # too few sizable queries for a meaningful leave-one-out
            # median — judge the raw ratio against the worst plausible
            # host noise instead of a self-referential yardstick
            norm = ratios[q] / NOISE_CEILING
        else:
            # the candidate must not sit in the median it is judged
            # against — one big regression would otherwise drag its own
            # yardstick up and hide itself; and the yardstick itself is
            # clamped to the noise ceiling, so co-regressed peers (their
            # ratios beyond plausible host noise) cannot excuse it either
            others = [r for p, r in sizable.items() if p != q]
            med_q = min(statistics.median(others), NOISE_CEILING)
            norm = ratios[q] / med_q
        if norm > RATIO and (latest[q] - prev[q]) >= MIN_ABS:
            flagged.append((norm, q))
    flagged.sort(reverse=True)

    # total guards: per-query normalization absorbs anything that shifts
    # most queries together, so a uniformly-slower build exits 0 above.
    # (a) adjusted total with the median CLAMPED to the noise ceiling —
    # a median ratio beyond plausible host noise is not divided away;
    # (b) raw-total backstop above the noise band, immune to any
    # normalization at all.
    prev_common_total = sum(prev[q] for q in common)
    latest_common_total = sum(latest[q] for q in common)
    med_clamped = min(med, NOISE_CEILING) if med > 0 else 1.0
    adj_total = latest_common_total / med_clamped
    total_regressed = (prev_common_total > 0
                       and adj_total > prev_common_total * TOTAL_RATIO
                       and adj_total - prev_common_total >= TOTAL_MIN_ABS)
    raw_regressed = (prev_common_total > 0
                     and latest_common_total
                     > prev_common_total * RAW_TOTAL_RATIO
                     and latest_common_total - prev_common_total
                     >= TOTAL_MIN_ABS)

    new_keys = sorted(set(latest) - set(prev))
    total = latest_total if latest_total is not None else sum(latest.values())
    print(f"compared {len(common)} queries "
          f"({len(new_keys)} new, not compared); host-speed median ratio "
          f"{med:.2f}; latest total {total:.1f}s")
    for norm, q in flagged:
        print(f"  REGRESSION {q}: {prev[q]:.2f}s -> {latest[q]:.2f}s "
              f"({latest[q] / prev[q]:.2f}x raw, {norm:.2f}x vs median)")
    if not flagged:
        print("  no per-query regressions beyond the noise-normalized "
              f"{RATIO}x threshold")
    if total_regressed:
        print(f"  TOTAL REGRESSION: noise-adjusted common total "
              f"{adj_total:.1f}s (median clamped to {med_clamped:.2f}) "
              f"exceeds previous {prev_common_total:.1f}s "
              f"by more than {(TOTAL_RATIO - 1) * 100:.0f}%")
    else:
        print(f"  noise-adjusted common total {adj_total:.1f}s vs previous "
              f"{prev_common_total:.1f}s (guard at {TOTAL_RATIO}x, "
              f"median clamped to {med_clamped:.2f})")
    if raw_regressed:
        print(f"  RAW TOTAL REGRESSION: common total {latest_common_total:.1f}s "
              f"exceeds previous {prev_common_total:.1f}s by more than "
              f"{(RAW_TOTAL_RATIO - 1) * 100:.0f}% — beyond the documented "
              f"host-noise band even without normalization")
    else:
        print(f"  raw common total {latest_common_total:.1f}s vs previous "
              f"{prev_common_total:.1f}s (backstop at {RAW_TOTAL_RATIO}x)")
        # the irreducible dead zone (docstring): a uniform shift past the
        # noise ceiling but inside the raw backstop could be either one
        # noisy sample or a real build slowdown — say so instead of
        # silently passing
        if (prev_common_total > 0
                and latest_common_total
                > prev_common_total * NOISE_CEILING
                and latest_common_total - prev_common_total
                >= TOTAL_MIN_ABS):
            print(f"  TOTAL AMBIGUOUS: raw ratio "
                  f"{latest_common_total / prev_common_total:.2f}x sits "
                  f"between the noise ceiling ({NOISE_CEILING}x) and the "
                  f"backstop ({RAW_TOTAL_RATIO}x) — one sample cannot "
                  f"separate host noise from a uniform build slowdown; "
                  f"re-measure (Scratch x3) before trusting this run")

    if record:
        with open(record, "w") as f:
            json.dump({"queries": latest, "total": total}, f, indent=1,
                      sort_keys=True)
        print(f"recorded latest map -> {record}")
    return 1 if (flagged or total_regressed or raw_regressed) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
