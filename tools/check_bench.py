#!/usr/bin/env python3
"""Per-gate bench regression guard.

Usage:
  python3 tools/check_bench.py <bench_run.json> [more_runs.json ...]
      Check the run(s) against bench_budgets.json. With several runs the
      best-of-runs time per gate is checked (the committed-artifact
      convention: a pair of quiet-host runs, best of pair graded).

  python3 tools/check_bench.py --update-budgets <run.json> [...]
      Regenerate bench_budgets.json: budget = 1.5 x best-of-runs per
      gate, reference calibration = min spark_range_xxhash_s.

CONVENTION (round-13 verdict): budgets are seeded from the PRIOR
round's adjudicated closing pair and the current round's pair is
graded AGAINST them — never regenerate budgets from the pair being
graded (that makes "0 breaches" vacuous). Re-baseline with
--update-budgets only AFTER a round's pair has been adjudicated,
so next round inherits it as its reference. Gates absent from the
budget file (new this round) are reported as NEW, not breaches.

The calibration ratio (run calib / reference calib) is printed next to
every breach so contended-host noise (calib >> 1) is distinguishable
from a real regression: a breach on a run whose calibration is itself
inflated is a re-run signal, not a code signal.

Since round 15 each run's `spark_range_xxhash_s` is the MEDIAN of 5
in-run probes (round-14 verdict: a single probe showed 40% spread
within one pair, too noisy to adjudicate breaches against); the raw
probes ride along as `spark_range_xxhash_probes` and their min-max
spread is printed so a reader can judge how much to trust the ratio.

Exit status: 1 if any gate breaches its budget while the run's
calibration is clean (ratio <= CALIB_NOISE), else 0.

Dev-tool only — not part of the Scala library.
"""
import json
import os
import sys

BUDGET_FACTOR = 1.5
CALIB_NOISE = 1.3  # calib ratio above this => host contended, don't trust
BUDGETS = os.path.join(os.path.dirname(__file__), "..", "bench_budgets.json")


def load_runs(paths):
    runs = [json.load(open(p)) for p in paths]
    best = {}
    for r in runs:
        for q, t in r["queries"].items():
            best[q] = min(best.get(q, float("inf")), t)
    calib = min(r["calib"]["spark_range_xxhash_s"] for r in runs)
    return best, calib


def update(paths):
    best, calib = load_runs(paths)
    doc = {
        "budget_factor": BUDGET_FACTOR,
        "reference_calib_spark_range_xxhash_s": calib,
        "source_runs": [os.path.basename(p) for p in paths],
        "budgets": {q: round(t * BUDGET_FACTOR, 4)
                    for q, t in sorted(best.items())},
    }
    with open(BUDGETS, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"wrote {len(doc['budgets'])} budgets "
          f"(factor {BUDGET_FACTOR}, ref calib {calib:.3f}s) to "
          f"{os.path.normpath(BUDGETS)}")


def check(paths):
    with open(BUDGETS) as f:
        doc = json.load(f)
    budgets = doc["budgets"]
    ref_calib = doc["reference_calib_spark_range_xxhash_s"]
    best, calib = load_runs(paths)
    ratio = calib / ref_calib
    host = "CONTENDED" if ratio > CALIB_NOISE else "ok"
    print(f"calibration: {calib:.3f}s vs reference {ref_calib:.3f}s "
          f"(ratio {ratio:.2f}, host {host})")
    for p in paths:
        probes = json.load(open(p))["calib"].get("spark_range_xxhash_probes")
        if probes:
            print(f"  {os.path.basename(p)}: median-of-{len(probes)} probes, "
                  f"spread {min(probes):.3f}-{max(probes):.3f}s")

    new = sorted(q for q in best if q not in budgets)
    gone = sorted(q for q in budgets if q not in best)
    breaches = sorted(
        ((best[q] / budgets[q], q) for q in best
         if q in budgets and best[q] > budgets[q]),
        reverse=True)

    for r, q in breaches:
        print(f"BREACH   {q}: {best[q]:.2f}s > budget {budgets[q]:.2f}s "
              f"({r:.2f}x, calib ratio {ratio:.2f})")
    for q in new:
        print(f"NOBUDGET {q}: {best[q]:.2f}s (new gate — next "
              f"--update-budgets will set {best[q] * BUDGET_FACTOR:.2f}s)")
    for q in gone:
        print(f"REMOVED  {q}: budgeted but absent from the run")
    print(f"{len(best)} gates: {len(breaches)} breach, {len(new)} new, "
          f"{len(gone)} removed")
    if breaches and ratio <= CALIB_NOISE:
        return 1
    if breaches:
        print("breaches on a contended host — re-run on a quiet machine "
              "before treating these as regressions")
    return 0


def main():
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    if args[0] == "--update-budgets":
        update(args[1:])
        return 0
    return check(args)


if __name__ == "__main__":
    sys.exit(main())
