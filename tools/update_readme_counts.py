#!/usr/bin/env python3
"""Patch README.md's `sbt test` count from a real sbt test run's output.

Usage: sbt -batch test 2>&1 | tee /tmp/sbt_test.log
       python3 tools/update_readme_counts.py /tmp/sbt_test.log

Reads the LAST "Tests: succeeded N" summary line (the aggregate) and the
matching "Suites: completed M" line, and rewrites the README's count
sentence, so the number is always generated from the suite itself.
"""
import re
import sys

log = open(sys.argv[1]).read()
tests = re.findall(r"Tests: succeeded (\d+), failed (\d+)", log)
suites = re.findall(r"Suites: completed (\d+), aborted (\d+)", log)
if not tests or not suites:
    sys.exit("no sbt test summary found in " + sys.argv[1])
n, failed = tests[-1]
m, aborted = suites[-1]
if failed != "0" or aborted != "0":
    sys.exit(f"suite not green (failed={failed}, aborted={aborted}) — not updating README")

path = "README.md"
src = open(path).read()
new_line = (f"sbt test                                    "
            f"# unit/property/plan-shape/golden tests "
            f"({n} tests, {m} suites — generated from the run by tools/update_readme_counts.py)")
patched, cnt = re.subn(r"sbt test\s+# unit/property/plan-shape/golden tests \([^)]*\)",
                       new_line, src)
if cnt != 1:
    sys.exit(f"expected exactly one README count line, found {cnt}")
open(path, "w").write(patched)
print(f"README updated: {n} tests, {m} suites")
