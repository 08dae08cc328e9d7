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


def decision_col(filt: SelectFilter | IgnoreFilter, path: Column) -> Column:
    """Decision column ('included'/'excluded'/'undecided') for file paths."""
    plain, inverted, fallback = _decisions(filt)
    basename = F.regexp_extract(path, "[^/]+$", 0)
    expr: Column = F.lit(fallback)
    # build ELSE→first: iterate rules forward so the LAST rule ends up as
    # the OUTERMOST (first-tested) WHEN — last-match-wins.
    for item in _file_rules(filt):
        candidate = path if item.is_anchored else basename
        hit = candidate.rlike("^(" + item.pattern + ")$")
        expr = F.when(hit, F.lit(inverted if item.is_inverted else plain)).otherwise(expr)
    return expr


def decision_sql(filt: SelectFilter | IgnoreFilter, path_expr: str) -> str:
    """The DuckDB mirror of :func:`decision_col`, same rules, same order."""
    plain, inverted, fallback = _decisions(filt)
    basename = f"regexp_extract({path_expr}, '[^/]+$')"
    sql = f"'{fallback}'"
    for item in _file_rules(filt):
        candidate = path_expr if item.is_anchored else basename
        pattern = item.pattern.replace("'", "''")
        decision = inverted if item.is_inverted else plain
        sql = (
            f"CASE WHEN regexp_full_match({candidate}, '{pattern}') "
            f"THEN '{decision}' ELSE {sql} END"
        )
    return sql


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
