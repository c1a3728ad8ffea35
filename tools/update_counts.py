#!/usr/bin/env python3
"""Regenerate the gate-count lines in README.md and COVERAGE.md from
machine output (VERDICT r11 #4: the builder's docs must not disagree
with `sbt test` / `CountQueries`).

Usage:
  python3 tools/update_counts.py <sbt_test_log> <countqueries_log>

Reads from the sbt test log:
  - "Tests: succeeded N, ..."  -> total test count
  - "Suites: completed M, ..." -> suite count
and from the CountQueries log:
  - "QUERIES=N" / "ORACLES=M"
then rewrites, in place:
  - README.md:  the "`sbt test` — X tests across Y suites" line
  - README.md / COVERAGE.md: "(N oracle-checked + K rows-only" forms
Exits nonzero if any expected pattern is missing, so a silent format
drift cannot fake a refresh.
"""
import re
import sys


def require(cond, msg):
    if not cond:
        sys.exit(f"update_counts: {msg}")


def main():
    require(len(sys.argv) == 3,
            "usage: update_counts.py <sbt_test_log> <countqueries_log>")
    test_log = open(sys.argv[1], errors="replace").read()
    cq_log = open(sys.argv[2], errors="replace").read()

    m = re.search(r"Tests: succeeded (\d+)", test_log)
    require(m, "no 'Tests: succeeded N' in test log")
    tests = int(m.group(1))
    m = re.search(r"Suites: completed (\d+)", test_log)
    require(m, "no 'Suites: completed N' in test log")
    suites = int(m.group(1))
    m = re.search(r"QUERIES=(\d+)", cq_log)
    require(m, "no QUERIES= in CountQueries log")
    queries = int(m.group(1))
    m = re.search(r"ORACLES=(\d+)", cq_log)
    require(m, "no ORACLES= in CountQueries log")
    oracles = int(m.group(1))
    rows_only = queries - oracles

    def patch(path, subs):
        text = open(path).read()
        for pat, rep in subs:
            new, n = re.subn(pat, rep, text)
            require(n >= 1, f"pattern not found in {path}: {pat}")
            text = new
        open(path, "w").write(text)

    # README round-narrative counts are history and stay untouched; the
    # GATE line (the one the r11 verdict caught drifting) is the only
    # README edit
    patch("README.md", [
        (r"`sbt test` — \d+ tests across \d+ suites",
         f"`sbt test` — {tests} tests across {suites} suites"),
    ])
    patch("COVERAGE.md", [
        (r"\(\d+ oracle-checked \+ \d+ rows-only",
         f"({oracles} oracle-checked + {rows_only} rows-only"),
        (r"registry totals: \d+ queries, \d+ oracles",
         f"registry totals: {queries} queries, {oracles} oracles"),
    ])
    print(f"update_counts: tests={tests} suites={suites} "
          f"queries={queries} oracles={oracles} rows_only={rows_only}")


if __name__ == "__main__":
    main()
