#!/usr/bin/env python
"""CI-style line-coverage gate for the pure-Python semantic kernel.

The reference enforces 100% line/function/branch coverage on its core
(/root/reference/gcovr.cfg:5-7). This sandbox has no coverage.py /
pytest-cov (and installing is off-limits), so this gate measures line
coverage with the stdlib ``trace`` module over the Spark-free kernel
test suite — the modules whose logic is pure Python and fully
exercisable without a JVM:

    glug_spark/semantics/*.py   (glob compiler, filters, typetags, …)
    glug_spark/index/codec.py   (varbyte/delta/block codec)
    glug_spark/query/parser.py  (glug-dialect query parser)
    glug_spark/query/oracle.py  (composed-query oracle SQL builder)

Exit code 1 if total coverage < FLOOR. Uncovered lines are printed so
BASELINE.md can list the remainder. (Spark-side operators are gated by
the driver's 52-row oracle scoreboard + plan-shape tests instead —
execution-path coverage, which line counters can't see through the JVM.)

Usage: python tools/coverage_gate.py [--floor 90]
"""

from __future__ import annotations

import os
import sys
import trace

sys.path.insert(0, "/root/repo")

FLOOR = 95.0

#: Spark-free test modules (importing the spark fixture boots a JVM and
#: makes settrace tracing intolerably slow)
FAST_TESTS = [
    "tests/test_semantics_glob.py",
    "tests/test_semantics_filters.py",
    "tests/test_query_parser.py",
    "tests/test_codec.py",
    "tests/test_multipattern.py",
    "tests/test_cli.py",
    "tests/test_oracle_builder.py",
    "tests/test_kernel_gaps.py",
]

TARGETS = [
    "glug_spark/semantics/glob.py",
    "glug_spark/semantics/filters.py",
    "glug_spark/semantics/typetags.py",
    "glug_spark/semantics/lines.py",
    "glug_spark/semantics/tokenize.py",
    "glug_spark/index/codec.py",
    "glug_spark/query/parser.py",
    "glug_spark/query/oracle.py",
]


def main() -> int:
    floor = FLOOR
    if "--floor" in sys.argv:
        floor = float(sys.argv[sys.argv.index("--floor") + 1])

    os.chdir("/root/repo")
    import pytest

    tracer = trace.Trace(count=1, trace=0, ignoredirs=[sys.prefix])
    rc = tracer.runfunc(
        pytest.main, ["-q", "-x", "-p", "no:cacheprovider", *FAST_TESTS]
    )
    if rc != 0:
        print(f"FAIL: kernel tests failed (rc={rc})")
        return 1

    counts = tracer.results().counts
    hit_by_file: dict[str, set[int]] = {}
    for (fname, line), _ in counts.items():
        hit_by_file.setdefault(os.path.abspath(fname), set()).add(line)

    total_exec = total_hit = 0
    print(f"{'module':44} {'lines':>6} {'miss':>5} {'cover':>7}")
    for rel in TARGETS:
        f = os.path.abspath(rel)
        executable = {
            ln for ln in trace._find_executable_linenos(f) if ln > 0
        }
        hit = hit_by_file.get(f, set()) & executable
        missing = sorted(executable - hit)
        total_exec += len(executable)
        total_hit += len(hit)
        pct = 100.0 * len(hit) / len(executable) if executable else 100.0
        print(f"{rel:44} {len(executable):6} {len(missing):5} {pct:6.1f}%")
        if missing:
            print(f"    missing: {missing}")
    total_pct = 100.0 * total_hit / total_exec if total_exec else 100.0
    print(f"{'TOTAL':44} {total_exec:6} {total_exec - total_hit:5} "
          f"{total_pct:6.1f}%  (floor {floor}%)")
    if total_pct < floor:
        print("FAIL: below coverage floor")
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
