"""Edge branches of the pure-Python kernel (coverage-gate closers):
empty-input guards, file-reading helpers, parser conveniences."""

from __future__ import annotations

import numpy as np

from glug_spark.index import codec
from glug_spark.query.parser import glob_regexes, parse_query
from glug_spark.semantics.lines import read_lines
from glug_spark.semantics.tokenize import tokenize_with_positions
from glug_spark.semantics.typetags import TypetagDatabase


def test_read_lines_crlf(tmp_path):
    p = tmp_path / "rules.gitignore"
    p.write_bytes(b"*.log\r\n!keep.log\n\r\nlast")
    assert read_lines(str(p)) == ["*.log", "!keep.log", "", "last"]


def test_tokenize_with_positions():
    assert tokenize_with_positions("a b a") == [(0, "a"), (1, "b"), (2, "a")]
    assert tokenize_with_positions("") == []


def test_parser_unclosed_quote_keeps_tail():
    plan = parse_query('foo "bar baz')
    assert plan.phrases == [["bar", "baz"]]
    assert plan.groups == [[("term", "foo")]]


def test_parser_plan_properties_and_glob_regexes():
    plan = parse_query("data dat* -tmp*")
    assert plan.positive_terms == ["data"]
    assert plan.positive_globs == ["dat*"]
    regs = glob_regexes(plan)
    assert set(regs) == {"dat*", "tmp*"}
    import re

    assert re.fullmatch(regs["dat*"], "database")
    assert not re.fullmatch(regs["dat*"], "da/t")


def test_typetag_expand_expression_and_bool():
    db = TypetagDatabase()
    expanded = db.expand_expression("#cpp,-x.txt")
    assert "*.cpp" in expanded and "-x.txt" in expanded


def test_codec_empty_inputs():
    assert codec.encode_positions([]) == b""
    last, max_tf = codec.block_meta(
        np.zeros(0, np.int64), np.zeros(0, np.int64)
    )
    assert len(last) == 0 and len(max_tf) == 0
    empty = codec.encode_runs_table(
        np.zeros(0, np.int64), np.zeros(0, np.int64),
        np.zeros(0, np.int64), np.zeros(0, np.int64),
        np.zeros(0, np.uint64),
    )
    assert all(len(v) == 0 for v in empty.values())
