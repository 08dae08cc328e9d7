"""Golden decision tests for ignore/select filters, ported from the
reference (test/unit/test_filter_ignore.cpp:53-145,
test_filter_select.cpp:49-125). Paths are POSIX strings relative to a
synthetic root; the C++ tests materialize a temp fs and pass absolute
paths — we replicate with ROOT-prefixed strings (the filters only do
string work, exactly like the reference's path handling).
"""

from __future__ import annotations

import pytest

from glug_spark.semantics import Decision, IgnoreFilter, SelectFilter
from glug_spark.semantics.lines import split_lines

ROOT = "/tmp/fixture"

U, E, I = Decision.UNDECIDED, Decision.EXCLUDED, Decision.INCLUDED

# (globs, cases[(relpath, is_dir, expected)], anchor_rel or None)
IGNORE_CASES = [
    (
        ["dir_only/"],
        [
            ("dir_only", False, U),
            ("dir_only", True, E),
            ("dir/dir_only", False, U),
            ("dir/dir_only", True, E),
            # files in ignored dirs are dropped by non-enumeration, not
            # by the filter itself
            ("dir_only/file", False, U),
        ],
        None,
    ),
    (
        ["nofixup ", "fixup\\ "],
        [
            ("nofixup", False, E),
            ("nofixup ", False, U),
            ("fixup", False, U),
            ("fixup ", False, E),
        ],
        None,
    ),
    (
        ["mid space", "escaped\\ space"],
        [
            ("mid space", False, E),
            ("escaped space", False, E),
            ("escaped\\ space", False, U),
        ],
        None,
    ),
    (
        ["mid,comma", "escaped\\,comma"],
        [
            ("mid,comma", False, E),
            ("escaped,comma", False, E),
            ("escaped\\,comma", False, U),
        ],
        None,
    ),
    (
        ["file_only", "!file_only/"],
        [
            ("file_only", False, E),
            ("file_only", True, I),
            ("dir/file_only", False, E),
            ("dir/file_only", True, I),
        ],
        None,
    ),
    (
        ["anchored/exact"],
        [
            ("anchored/exact", False, E),
            ("sub/anchored/exact", False, U),
        ],
        None,
    ),
    (
        ["/anchored", "unanchored"],
        [
            ("sub/anchored", False, E),
            ("sub/deeper/anchored", False, U),
            ("sub/unanchored", False, E),
            ("sub/deeper/unanchored", False, E),
        ],
        "sub",
    ),
    (
        ["test_*", "!*.[ch]pp", "_*"],
        [
            ("README.md", False, U),
            ("test_data.txt", False, E),
            ("test_logic.cpp", False, I),
            ("test_logic.hpp", False, I),
            ("_test_data.generated.hpp", False, E),
        ],
        None,
    ),
    (
        ["*.[1-9]"],
        [
            ("a.0", False, U),
            ("a.1", False, E),
            ("a.2", False, E),
            ("a.8", False, E),
            ("a.9", False, E),
        ],
        None,
    ),
    (
        # https://github.com/python/cpython/issues/130942 regression:
        # the range %-0 spans '/', must not match a path separator
        ["a[%-0]c"],
        [
            ("a.c", False, E),
            ("a/c", False, U),
        ],
        None,
    ),
]


@pytest.mark.parametrize("globs,cases,anchor", IGNORE_CASES)
def test_ignore_golden(globs, cases, anchor) -> None:
    anchor_abs = ROOT + "/" + anchor if anchor else ROOT
    filt = IgnoreFilter(globs, anchor_abs)
    for relpath, is_dir, expected in cases:
        actual = filt.apply(ROOT + "/" + relpath, is_dir)
        assert actual == expected, (globs, relpath, is_dir)


# (select_expression, cases[(relpath, is_dir, expected)])
SELECT_CASES = [
    (
        "",
        [
            ("README.md", False, U),
            ("main.cpp", False, U),
            ("src", True, U),
        ],
    ),
    (
        "*.md",
        [
            ("README.md", False, I),
            ("README.md", True, U),
            ("readme.md", False, I),  # case-sensitivity: distinct files
            ("main.cpp", False, E),
        ],
    ),
    (
        "*,-*.md",
        [
            ("README.md", False, E),
            ("README.md", True, U),
            ("main.cpp", False, I),
            ("foo.hpp", False, I),
        ],
    ),
    (
        "-*.md",
        [
            ("README.md", False, E),
            ("README.md", True, U),
            ("main.cpp", False, U),
            ("foo.hpp", False, U),
        ],
    ),
    (
        "*.cpp,*.hpp,-main.*",
        [
            ("main.cpp", False, E),
            ("main.log", False, E),
            ("foo.cpp", False, I),
            ("foo.hpp", False, I),
            ("README.md", False, E),
        ],
    ),
    (
        "src/",
        [
            ("src", True, I),
            ("extra/src", True, I),
            ("extra", True, E),
            ("include", True, E),
            ("README.md", False, U),
        ],
    ),
    (
        "src/*.cpp",
        [
            ("src", True, U),
            ("src/lib.cpp", False, I),
            ("src/detail/impl.cpp", False, E),
            ("extra/src/extra.cpp", False, E),
            ("main.cpp", False, E),
        ],
    ),
    (
        "src/**/*.cpp",
        [
            ("src", True, U),
            ("src/lib.cpp", False, I),
            ("src/detail/impl.cpp", False, I),
            ("extra/src/extra.cpp", False, E),
            ("main.cpp", False, E),
        ],
    ),
]


@pytest.mark.parametrize("expression,cases", SELECT_CASES)
def test_select_golden(expression, cases) -> None:
    filt = SelectFilter(expression, ROOT)
    for relpath, is_dir, expected in cases:
        actual = filt.apply(ROOT + "/" + relpath, is_dir)
        assert actual == expected, (expression, relpath, is_dir)


def test_split_lines_crlf() -> None:
    # reference getline semantics (src/filesystem.cpp:46-64)
    assert split_lines("a\r\nb\nc\r\n") == ["a", "b", "c"]
    assert split_lines("a\nb") == ["a", "b"]
    assert split_lines("") == []
    assert split_lines("\n") == [""]
    assert split_lines("a\r\r\n") == ["a\r"]  # only ONE trailing \r stripped
