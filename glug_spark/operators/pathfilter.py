"""glug select/ignore filters as native Spark expressions over paths.

The kernel (glug_spark.semantics) compiles rule lists plan-time; this
module lowers the *last-match-wins* resolution to a single reversed
CASE/WHEN chain — the first branch tested is the last rule, so the CASE's
first-match IS the reference's reverse-scan short-circuit
(reference src/filter.cpp:95-116, :167-186). The whole predicate is one
whole-stage-codegen'd JVM expression: no UDF, no shuffle, and Catalyst
can push it to the scan.

The DuckDB oracle receives the *same* kernel-compiled regex strings in
the same CASE order, so parity is structural, not coincidental.

All corpus documents are files (is_dir=False): directory-only ignore
rules are skipped at compile time for the file-side expression, exactly
as the reference skips them per-entry (src/filter.cpp:109-111).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from glug_spark.semantics.filters import Decision, IgnoreFilter, SelectFilter
from glug_spark.semantics.typetags import TypetagDatabase


def compile_select(expression: str, anchor: str = "site",
                   tags: TypetagDatabase | None = None) -> SelectFilter:
    """Typetag-expand then compile a select expression against an anchor."""
    db = tags or TypetagDatabase()
    return SelectFilter(db.expand_expression(expression), anchor)


def _file_rules(filt: SelectFilter | IgnoreFilter) -> list:
    if isinstance(filt, SelectFilter):
        return filt.files
    # ignore filters: directory-only rules can never match a file
    return [item for item in filt.items if not item.is_directory]


def _decisions(filt: SelectFilter | IgnoreFilter) -> tuple[str, str, str]:
    """(on_plain_match, on_inverted_match, fallback) decision strings."""
    if isinstance(filt, SelectFilter):
        return (
            Decision.INCLUDED.value,
            Decision.EXCLUDED.value,
            filt.files_fallback.value,
        )
    return Decision.EXCLUDED.value, Decision.INCLUDED.value, Decision.UNDECIDED.value


def _decision_runs(filt: SelectFilter | IgnoreFilter) -> list:
    """CONSECUTIVE same-decision file rules combined into one alternation
    per candidate kind (semantics.filters.build_runs) — the multi-pattern
    single-pass analog of the reference's hyperscan provider
    (src/regex/hyperscan.cpp:39-79): last-match-wins only needs WHICH
    DECISION matched last, so a 500-rule chain with no inversions is ONE
    regex evaluation instead of a 500-branch CASE."""
    from glug_spark.semantics.filters import build_runs

    return build_runs(_file_rules(filt), key_on_directory=False)


def decision_col(filt: SelectFilter | IgnoreFilter, path: Column) -> Column:
    """Decision column ('included'/'excluded'/'undecided') for file paths."""
    plain, inverted, fallback = _decisions(filt)
    basename = F.regexp_extract(path, "[^/]+$", 0)
    expr: Column = F.lit(fallback)
    # build ELSE→first: iterate runs forward so the LAST run ends up as
    # the OUTERMOST (first-tested) WHEN — last-match-wins.
    for run in _decision_runs(filt):
        hit: Column = F.lit(False)
        if run.base_all is not None:
            hit = hit | basename.rlike("^(?:" + run.base_all + ")$")
        if run.path_all is not None:
            hit = hit | path.rlike("^(?:" + run.path_all + ")$")
        expr = F.when(hit, F.lit(inverted if run.is_inverted else plain)).otherwise(expr)
    return expr


def decision_sql(filt: SelectFilter | IgnoreFilter, path_expr: str) -> str:
    """The DuckDB mirror of :func:`decision_col`, same runs, same order."""
    plain, inverted, fallback = _decisions(filt)
    basename = f"regexp_extract({path_expr}, '[^/]+$')"
    sql = f"'{fallback}'"
    for run in _decision_runs(filt):
        hits = []
        if run.base_all is not None:
            p = run.base_all.replace("'", "''")
            hits.append(f"regexp_full_match({basename}, '{p}')")
        if run.path_all is not None:
            p = run.path_all.replace("'", "''")
            hits.append(f"regexp_full_match({path_expr}, '{p}')")
        decision = inverted if run.is_inverted else plain
        sql = (
            f"CASE WHEN ({' OR '.join(hits)}) "
            f"THEN '{decision}' ELSE {sql} END"
        )
    return sql


def scoped_decision_col(filt: IgnoreFilter, scope: str, path: Column) -> Column:
    """An ignore file at directory ``scope`` only ever sees entries under
    it (the reference loads one filter per directory and applies it while
    scanning that subtree, src/filesystem.cpp:141-146) — outside the
    scope the decision is UNDECIDED."""
    in_scope = path.startswith(scope + "/")
    return F.when(in_scope, decision_col(filt, path)).otherwise(
        F.lit(Decision.UNDECIDED.value)
    )


def scoped_decision_sql(filt: IgnoreFilter, scope: str, path_expr: str) -> str:
    scope_lit = (scope + "/").replace("'", "''")
    return (
        f"CASE WHEN {path_expr} LIKE '{scope_lit}%' "
        f"THEN ({decision_sql(filt, path_expr)}) ELSE 'undecided' END"
    )


def chain_admission_col(select_filt: SelectFilter,
                        scoped_ignores: list[tuple[str, IgnoreFilter]],
                        path: Column) -> Column:
    """Hierarchical admission: select EXCLUDED drops; then the ignore
    chain INNERMOST scope first (deepest prefix = last .gitignore pushed
    on the reference's stack), first non-undecided decides; default keep
    (reference src/filesystem.cpp:149-176)."""
    ordered = sorted(scoped_ignores, key=lambda sr: sr[0].count("/"))
    admitted = F.lit(True)
    for scope, filt in ordered:  # outermost builds first → innermost outermost-CASE
        d = scoped_decision_col(filt, scope, path)
        admitted = (
            F.when(d == Decision.EXCLUDED.value, F.lit(False))
            .when(d == Decision.INCLUDED.value, F.lit(True))
            .otherwise(admitted)
        )
    select_d = decision_col(select_filt, path)
    return F.when(select_d == Decision.EXCLUDED.value, F.lit(False)).otherwise(admitted)


def chain_admission_sql(select_filt: SelectFilter,
                        scoped_ignores: list[tuple[str, IgnoreFilter]],
                        path_expr: str) -> str:
    ordered = sorted(scoped_ignores, key=lambda sr: sr[0].count("/"))
    admitted = "TRUE"
    for scope, filt in ordered:
        d = scoped_decision_sql(filt, scope, path_expr)
        admitted = (
            f"CASE WHEN ({d}) = 'excluded' THEN FALSE "
            f"WHEN ({d}) = 'included' THEN TRUE ELSE {admitted} END"
        )
    sel = decision_sql(select_filt, path_expr)
    return f"CASE WHEN ({sel}) = 'excluded' THEN FALSE ELSE {admitted} END"


def dfs_order_key_col(path: Column) -> Column:
    """Sort key reproducing the reference's deterministic enumeration:
    depth-first, files before directories per directory, each
    lexicographic byte-wise (src/filesystem.cpp:188-209).

    Each directory segment becomes chr(1)+seg+chr(2), the final (file)
    segment chr(0)+seg — so at any level every file sorts before every
    subdirectory, and names compare byte-wise within a kind."""
    segs = F.split(path, "/")
    n = F.size(segs)
    keyed = F.transform(
        segs,
        lambda seg, i: F.when(
            i < n - 1, F.concat(F.lit("\x01"), seg, F.lit("\x02"))
        ).otherwise(F.concat(F.lit("\x00"), seg)),
    )
    return F.concat_ws("", keyed)


DFS_ORDER_KEY_SQL = (
    "array_to_string(list_transform(string_split({path}, '/'), "
    "(seg, i) -> CASE WHEN i < len(string_split({path}, '/')) "
    "THEN chr(1) || seg || chr(2) ELSE chr(0) || seg END), '')"
)


def admission_col(select_filt: SelectFilter,
                  ignore_filts: list[IgnoreFilter],
                  path: Column) -> Column:
    """Document admission: the reference's per-entry pipeline
    (src/filesystem.cpp:149-176) — select EXCLUDED drops; then the ignore
    chain innermost→outermost, first non-undecided decides; default keep.

    ``ignore_filts`` is ordered innermost-first.
    """
    admitted = F.lit(True)
    for filt in reversed(ignore_filts):  # build outermost→in so innermost tests first
        d = decision_col(filt, path)
        admitted = F.when(
            d == Decision.EXCLUDED.value, F.lit(False)
        ).when(d == Decision.INCLUDED.value, F.lit(True)).otherwise(admitted)
    select_d = decision_col(select_filt, path)
    return F.when(select_d == Decision.EXCLUDED.value, F.lit(False)).otherwise(admitted)
