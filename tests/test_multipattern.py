"""One-pass multi-pattern rule matching (the hyperscan analog,
reference src/regex/hyperscan.cpp:39-79): combined-alternation runs must
be decision-identical to the per-rule reverse scan, for every engine
that evaluates them (Python kernel, DuckDB regexp_full_match), and the
vectorized batch kernel must beat the scalar per-(path, rule) loop on
wide chains.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from glug_spark.operators.pathfilter import decision_sql
from glug_spark.semantics.filters import (
    DEC_EXCLUDED,
    DEC_INCLUDED,
    DEC_UNDECIDED,
    Decision,
    IgnoreFilter,
    SelectFilter,
)

_CODE_OF = {
    Decision.UNDECIDED: DEC_UNDECIDED,
    Decision.EXCLUDED: DEC_EXCLUDED,
    Decision.INCLUDED: DEC_INCLUDED,
}

_seg = st.text(alphabet="abc.", min_size=1, max_size=4)
_rule = st.builds(
    lambda inv, anchor_seg, body, star, dironly: (
        ("!" if inv else "")
        + (anchor_seg + "/" if anchor_seg else "")
        + body
        + ("*" if star else "")
        + ("/" if dironly else "")
    ),
    st.booleans(),
    st.one_of(st.none(), _seg),
    st.one_of(_seg, st.sampled_from(["*.txt", "doc?", "[ab]x", "**/b"])),
    st.booleans(),
    st.booleans(),
)
_path = st.builds(
    lambda segs: "site/" + "/".join(segs),
    st.lists(_seg, min_size=1, max_size=3),
)


@settings(max_examples=120, deadline=None)
@given(
    rules=st.lists(_rule, min_size=1, max_size=12),
    paths=st.lists(_path, min_size=1, max_size=12),
    dirs=st.lists(st.booleans(), min_size=12, max_size=12),
)
def test_ignore_apply_batch_matches_scalar(rules, paths, dirs):
    filt = IgnoreFilter(rules, "site")
    is_dir = np.array(dirs[: len(paths)], dtype=bool)
    ps = pd.Series(paths)
    names = ps.str.replace(r"^.*/", "", regex=True)
    got = filt.apply_batch(ps, names, is_dir)
    want = [
        _CODE_OF[filt.apply(p, bool(d))] for p, d in zip(paths, is_dir)
    ]
    assert list(got) == want


@settings(max_examples=120, deadline=None)
@given(
    rules=st.lists(_rule, min_size=1, max_size=12),
    paths=st.lists(_path, min_size=1, max_size=12),
    dirs=st.lists(st.booleans(), min_size=12, max_size=12),
)
def test_select_apply_batch_matches_scalar(rules, paths, dirs):
    filt = SelectFilter(rules, "site")
    is_dir = np.array(dirs[: len(paths)], dtype=bool)
    ps = pd.Series(paths)
    names = ps.str.replace(r"^.*/", "", regex=True)
    got = filt.apply_batch(ps, names, is_dir)
    want = [
        _CODE_OF[filt.apply(p, bool(d))] for p, d in zip(paths, is_dir)
    ]
    assert list(got) == want


@settings(max_examples=60, deadline=None)
@given(
    rules=st.lists(_rule, min_size=1, max_size=10),
    paths=st.lists(_path, min_size=1, max_size=8),
)
def test_combined_decision_sql_matches_scalar(rules, paths):
    """The combined-alternation SQL lowering (files only, like the
    production column) must agree with the scalar kernel under RE2."""
    import duckdb

    filt = IgnoreFilter(rules, "site")
    sql = decision_sql(filt, "path")
    rows = ", ".join(f"('{p}')" for p in set(paths))
    got = dict(duckdb.sql(
        f"SELECT path, {sql} AS d FROM (VALUES {rows}) t(path)"
    ).fetchall())
    for p in set(paths):
        assert got[p] == filt.apply(p, False).value, (p, rules)


def _wide_chain(n_rules: int) -> IgnoreFilter:
    # realistic .gitignore shape: long stretches of plain rules with a
    # few sprinkled negations (run-combining thrives on exactly this)
    rules = []
    for i in range(n_rules):
        if i % 97 == 96:
            rules.append(f"!keep{i}.txt")
        elif i % 3 == 0:
            rules.append(f"tmp{i}/*.log")
        elif i % 3 == 1:
            rules.append(f"*.bak{i}")
        else:
            rules.append(f"build{i}/")
    return IgnoreFilter(rules, "site")


def test_wide_chain_collapses_to_few_runs():
    filt = _wide_chain(500)
    # 500 rules, ~5 inversions → ~11 runs, not 500 CASE branches
    assert len(filt.runs) <= 2 * (500 // 97) + 3, len(filt.runs)


def test_wide_chain_batch_kernel_speedup():
    """≥100k paths through a 500-rule chain: the combined-run batch
    kernel must beat the scalar per-(path, rule) loop by a wide margin
    (soft floor 3× to stay robust under VM noise; tools/bench_rules.py
    records the headline number)."""
    filt = _wide_chain(500)
    n = 100_000
    paths = pd.Series([
        f"site/d{i % 37}/f{i}.{'bak7' if i % 11 == 0 else 'txt'}"
        for i in range(n)
    ])
    names = paths.str.replace(r"^.*/", "", regex=True)
    is_dir = np.zeros(n, dtype=bool)

    t0 = time.perf_counter()
    got = filt.apply_batch(paths, names, is_dir)
    batch_sec = time.perf_counter() - t0

    sample = slice(0, 2000)  # scalar loop is too slow for all 100k
    t0 = time.perf_counter()
    want = [_CODE_OF[filt.apply(p, False)] for p in paths[sample]]
    scalar_sec = (time.perf_counter() - t0) * (n / 2000)

    assert list(got[sample]) == want
    assert scalar_sec / batch_sec >= 3.0, (scalar_sec, batch_sec)
