"""Pure-Python semantic kernel — behavioral parity with the reference.

Everything in this package is *plan-time* code: it runs on dozens of
pattern strings when a query is compiled, never per-row on data. The
per-row work happens JVM-side via the regex strings this kernel emits.
"""

from glug_spark.semantics.glob import (
    Decomposition,
    decompose,
    glob_escape,
    split,
    to_regex,
)
from glug_spark.semantics.typetags import BUILTIN_TAGS, TypetagDatabase
from glug_spark.semantics.filters import (
    Decision,
    IgnoreFilter,
    SelectFilter,
)
from glug_spark.semantics.lines import read_lines, split_lines
from glug_spark.semantics.tokenize import TOKEN_PATTERN, tokenize
from glug_spark.semantics.extract import extract_text, wrap_html

__all__ = [
    "BUILTIN_TAGS",
    "Decision",
    "Decomposition",
    "IgnoreFilter",
    "SelectFilter",
    "TOKEN_PATTERN",
    "TypetagDatabase",
    "decompose",
    "extract_text",
    "glob_escape",
    "read_lines",
    "split",
    "split_lines",
    "to_regex",
    "tokenize",
    "wrap_html",
]
