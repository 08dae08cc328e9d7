"""Golden tests for the glob kernel, ported from the reference's gtest
tables (test/unit/test_glob_to_regex.cpp:69-257,
test_glob_decompose.cpp:51-236, test_glob_typetag.cpp:40-68).

Each to_regex case re-runs with x/xx affixes (compositionality property,
reference test_glob_to_regex.cpp:48-66); each decompose case re-runs with
a trailing space appended (whitespace-strip invariant, :23-48).
"""

from __future__ import annotations

import re

import pytest

from glug_spark.semantics import (
    Decomposition,
    TypetagDatabase,
    decompose,
    glob_escape,
    split,
    to_regex,
)

NONE, PREFIX, SUFFIX, BOTH = 0, 1, 2, 3

# (glob, expected_regex, affix_mask) — reference test_glob_to_regex.cpp
TO_REGEX_CASES = [
    # literal (:69-78)
    ("", "", BOTH),
    ("a", "a", BOTH),
    ("ab", "ab", BOTH),
    ("abc", "abc", BOTH),
    # escaped_literal (:81-102)
    (" ", "\\ ", BOTH),
    ("#", "\\#", BOTH),
    ("$", "\\$", BOTH),
    ("&", "\\&", BOTH),
    ("(", "\\(", BOTH),
    (")", "\\)", BOTH),
    ("+", "\\+", BOTH),
    ("-", "\\-", BOTH),
    (".", "\\.", BOTH),
    ("[", "\\[", BOTH),
    ("]", "\\]", BOTH),
    ("^", "\\^", BOTH),
    ("{", "\\{", BOTH),
    ("|", "\\|", BOTH),
    ("}", "\\}", BOTH),
    ("~", "\\~", BOTH),
    # escaped_backspace (:105-119)
    ("\\[a-c]", "\\[a\\-c\\]", BOTH),
    ("\\[!a-c]", "\\[!a\\-c\\]", BOTH),
    ("\\*", "\\*", BOTH),
    ("\\?", "\\?", BOTH),
    ("\\ ", "\\ ", BOTH),
    ("\\,", "\\,", BOTH),
    ("\\.", "\\.", BOTH),
    ("\\??\\?", "\\?[^/]\\?", BOTH),
    ("\\", "\\\\", PREFIX),
    # question_mark (:122-128)
    ("?", "[^/]", BOTH),
    # star (:131-146)
    ("*", "[^/]+", NONE),
    ("/*", "/[^/]+", PREFIX),
    ("*/", "[^/]+/", SUFFIX),
    ("/*/", "/[^/]+/", BOTH),
    ("a*", "a[^/]*", BOTH),
    ("*a", "[^/]*a", BOTH),
    ("a*b", "a[^/]*b", BOTH),
    ("a/*", "a/[^/]+", PREFIX),
    ("*/a", "[^/]+/a", SUFFIX),
    ("a/*/b", "a/[^/]+/b", BOTH),
    # star_star (:149-162)
    ("**", ".*", NONE),
    ("a**", "a[^/]*", PREFIX),
    ("**b", "[^/]*b", SUFFIX),
    ("a**b", "a[^/]*b", BOTH),
    ("***", "[^/]+", NONE),
    ("/**", "/.*", PREFIX),
    ("**/", "(.+/)?", SUFFIX),
    ("/**/", "/(.+/)?", BOTH),
    # set_invalid (:165-183)
    ("[", "\\[", BOTH),
    ("[]", "\\[\\]", BOTH),
    ("[!]", "\\[!\\]", BOTH),
    ("[/]", "\\[/\\]", BOTH),
    ("[a/]", "\\[a/\\]", BOTH),
    ("[ab/]", "\\[ab/\\]", BOTH),
    ("[abc/]", "\\[abc/\\]", BOTH),
    ("[/a]", "\\[/a\\]", BOTH),
    ("[/ab]", "\\[/ab\\]", BOTH),
    ("[/abc]", "\\[/abc\\]", BOTH),
    ("[?", "\\[\\?", BOTH),
    ("[*", "\\[\\*", BOTH),
    ("[/?]", "\\[/\\?\\]", BOTH),
    # set_literal (:186-204)
    ("[a]", "[a]", BOTH),
    ("[ab]", "[ab]", BOTH),
    ("[abc]", "[abc]", BOTH),
    ("[[]", "[\\[]", BOTH),
    ("[]]", "[\\]]", BOTH),
    ("[*]", "[\\*]", BOTH),
    ("[?]", "[\\?]", BOTH),
    ("[-]", "[\\-]", BOTH),
    ("[a-]", "[a\\-]", BOTH),
    ("[-b]", "[\\-b]", BOTH),
    ("[--]", "[\\-\\-]", BOTH),
    ("[-abc]", "[\\-abc]", BOTH),
    ("[abc-]", "[abc\\-]", BOTH),
    # set_range (:207-227)
    ("[a-c]", "[a-c]", BOTH),
    ("[a-a]", "[a-a]", BOTH),
    ("[c-a]", "[c-a]", BOTH),
    ("[a-c*]", "[a-c\\*]", BOTH),
    ("[a-?]", "[a-\\?]", BOTH),
    ("[?-c]", "[\\?-c]", BOTH),
    ("[abcx-z]", "[abcx-z]", BOTH),
    ("[a-cxyz]", "[a-cxyz]", BOTH),
    ("[a--]", "[a-\\-]", BOTH),
    ("[--%]", "[\\--%]", BOTH),
    ("[a-c-x-z]", "[a-c\\-x-z]", BOTH),
    ("[#-%]", "[\\#-%]", BOTH),
    ("[%-9]", "[%-\\.0-9]", BOTH),
    ("[.-9]", "[\\.-\\.0-9]", BOTH),
    ("[%-0]", "[%-\\.0-0]", BOTH),
    # set_negative (:230-241)
    ("[!a]", "[^/a]", BOTH),
    ("[!abc]", "[^/abc]", BOTH),
    ("[!a-c]", "[^/a-c]", BOTH),
    ("[!a-a]", "[^/a-a]", BOTH),
    ("[!c-a]", "[^/c-a]", BOTH),
    ("[!%-9]", "[^/%-9]", BOTH),
    # mix (:244-257)
    ("a-cd[x--]*[!mon]", "a\\-cd[x-\\-][^/]*[^/mon]", BOTH),
    ("*-asn1.[ch]", "[^/]*\\-asn1\\.[ch]", BOTH),
    ("b[0-9]*", "b[0-9][^/]*", BOTH),
    ("*.c.[012]*.*", "[^/]*\\.c\\.[012][^/]*\\.[^/]*", BOTH),
    ("/[gmnq]conf-bin", "/[gmnq]conf\\-bin", BOTH),
    ("policy/*.conf", "policy/[^/]*\\.conf", BOTH),
    ("*.py[cod]", "[^/]*\\.py[cod]", BOTH),
    ("susp-[0-9]*-x[0-9]*", "susp\\-[0-9][^/]*\\-x[0-9][^/]*", BOTH),
]


@pytest.mark.parametrize("glob,expected,affix", TO_REGEX_CASES)
def test_to_regex_golden(glob: str, expected: str, affix: int) -> None:
    assert to_regex(glob) == expected
    if affix & PREFIX:
        assert to_regex("x" + glob) == "x" + expected
        assert to_regex("xx" + glob) == "xx" + expected
    if affix & SUFFIX:
        assert to_regex(glob + "x") == expected + "x"
        assert to_regex(glob + "xx") == expected + "xx"
    if affix == BOTH:
        assert to_regex("x" + glob + "x") == "x" + expected + "x"
        assert to_regex("xx" + glob + "xx") == "xx" + expected + "xx"


# Degenerate reversed ranges: the glob compiler emits them verbatim (the
# reference golden-tests only the emitted *string*); every regex engine —
# Java, RE2, PCRE2, Python re — rejects them at compile time, so they can
# never form a usable filter anywhere.
_UNCOMPILABLE = {"[c-a]", "[a-?]", "[a--]", "[--%]", "[!c-a]", "a-cd[x--]*[!mon]"}


@pytest.mark.parametrize("glob,expected,affix", TO_REGEX_CASES)
def test_to_regex_compiles_in_python_re(glob: str, expected: str, affix: int) -> None:
    # Portability property: every emitted pattern must be a valid Python
    # regex (it is also used verbatim in Java regex / RE2 — exercised by
    # the Spark/DuckDB parity tests).
    if glob in _UNCOMPILABLE:
        pytest.skip("reversed range: rejected by all engines at compile time")
    re.compile(expected)


# (glob_line, mode, pattern, is_inverted, is_anchored, is_directory)
DECOMPOSE_CASES = [
    # empty (reference test_glob_decompose.cpp:51-66)
    ("", "ignore", "", False, False, False),
    ("#", "ignore", "", False, False, False),
    ("#a", "ignore", "", False, False, False),
    ("#/", "ignore", "", False, False, False),
    ("#a/b", "ignore", "", False, False, False),
    ("#!a/b", "ignore", "", False, False, False),
    ("/", "ignore", "", False, False, False),
    ("//", "ignore", "", False, False, False),
    ("///", "ignore", "", False, False, False),
    # simple (:69-81)
    ("a", "ignore", "a", False, False, False),
    ("abc", "ignore", "abc", False, False, False),
    ("-abc", "ignore", "-abc", False, False, False),
    ("\\#abc", "ignore", "#abc", False, False, False),
    ("\\##abc", "ignore", "##abc", False, False, False),
    ("\\!abc", "ignore", "!abc", False, False, False),
    ("\\!!abc", "ignore", "!!abc", False, False, False),
    # trailing_whitespace (:84-94)
    (" ", "ignore", "", False, False, False),
    ("a ", "ignore", "a", False, False, False),
    ("a  ", "ignore", "a", False, False, False),
    ("a\\ ", "ignore", "a\\ ", False, False, False),
    ("a \\ ", "ignore", "a \\ ", False, False, False),
    # negative (:97-105)
    ("!a", "ignore", "a", True, False, False),
    ("!!a", "ignore", "!a", True, False, False),
    ("!#a", "ignore", "#a", True, False, False),
    # anchored (:108-118)
    ("/abc", "ignore", "abc", False, True, False),
    ("//abc", "ignore", "abc", False, True, False),
    ("///abc", "ignore", "abc", False, True, False),
    ("a/bc", "ignore", "a/bc", False, True, False),
    ("/a/bc", "ignore", "a/bc", False, True, False),
    # negative_anchored (:121-129)
    ("!/abc", "ignore", "abc", True, True, False),
    ("!a/bc", "ignore", "a/bc", True, True, False),
    ("!/a/bc", "ignore", "a/bc", True, True, False),
    # directory (:132-141)
    ("a/", "ignore", "a", False, False, True),
    ("abc/", "ignore", "abc", False, False, True),
    ("\\#a/", "ignore", "#a", False, False, True),
    ("\\!a/", "ignore", "!a", False, False, True),
    # negative_directory (:144-151)
    ("!a/", "ignore", "a", True, False, True),
    ("!!a/", "ignore", "!a", True, False, True),
    # anchored_directory (:154-162)
    ("/a/", "ignore", "a", False, True, True),
    ("/abc/", "ignore", "abc", False, True, True),
    ("/!a/b/c/", "ignore", "!a/b/c", False, True, True),
    # negative_anchored_directory (:165-173)
    ("!/a/", "ignore", "a", True, True, True),
    ("!/abc/", "ignore", "abc", True, True, True),
    ("!/a/b/c/", "ignore", "a/b/c", True, True, True),
    # select_mode (:176-190)
    ("abc", "select", "abc", False, False, False),
    ("#abc", "select", "#abc", False, False, False),
    ("!abc", "select", "!abc", False, False, False),
    ("-abc", "select", "abc", True, False, False),
    ("/abc", "select", "abc", False, True, False),
    ("abc/", "select", "abc", False, False, True),
    ("-/abc", "select", "abc", True, True, False),
    ("-abc/", "select", "abc", True, False, True),
    ("-/abc/", "select", "abc", True, True, True),
]


@pytest.mark.parametrize(
    "line,mode,pattern,inverted,anchored,directory", DECOMPOSE_CASES
)
def test_decompose_golden(
    line: str, mode: str, pattern: str,
    inverted: bool, anchored: bool, directory: bool,
) -> None:
    for candidate in (line, line + " "):  # trailing-space invariant
        d = decompose(candidate, mode)  # type: ignore[arg-type]
        assert d == Decomposition(pattern, inverted, anchored, directory), candidate


# (input, expected, delimiter) — reference test_glob_decompose.cpp:207-236
SPLIT_CASES = [
    ("", [], ","),
    ("a", ["a"], ","),
    ("abc", ["abc"], ","),
    ("abc,def", ["abc", "def"], ","),
    ("abc,def,xyz", ["abc", "def", "xyz"], ","),
    ("abc,", ["abc"], ","),
    (",abc", ["abc"], ","),
    (",abc,,xyz,", ["abc", "xyz"], ","),
    ("\\abc", ["\\abc"], ","),
    ("abc\\", ["abc\\"], ","),
    ("\\abc\\", ["\\abc\\"], ","),
    ("abc\\,xyz", ["abc\\,xyz"], ","),
    ("abc\\\\,xyz", ["abc\\\\", "xyz"], ","),
    ("abc\\\\\\,xyz", ["abc\\\\\\,xyz"], ","),
    ("abc\\ ,xyz", ["abc\\ ", "xyz"], ","),
    ("abc\\\\ ,xyz", ["abc\\\\ ", "xyz"], ","),
    ("abc\\\\\\ ,xyz", ["abc\\\\\\ ", "xyz"], ","),
    ("abc\\ \\,xyz", ["abc\\ \\,xyz"], ","),
    ("abc\\ \\\\,xyz", ["abc\\ \\\\", "xyz"], ","),
    ("abc,def", ["abc,def"], ":"),
    ("abc:def", ["abc", "def"], ":"),
    ("abc,def:xyz", ["abc,def", "xyz"], ":"),
    ("abc\\:xyz", ["abc\\:xyz"], ":"),
    ("abc\\\\:xyz", ["abc\\\\", "xyz"], ":"),
]


@pytest.mark.parametrize("inp,expected,delim", SPLIT_CASES)
def test_split_golden(inp: str, expected: list[str], delim: str) -> None:
    assert split(inp, delim) == expected


# reference test_glob_to_regex.cpp:270-281
GLOB_ESCAPE_CASES = [
    ("abc", "abc"),
    ("main.c", "main.c"),
    ("question?", "question\\?"),
    ("star*", "star\\*"),
    ("[range]", "\\[range]"),
    ("[*?", "\\[\\*\\?"),
]


@pytest.mark.parametrize("inp,expected", GLOB_ESCAPE_CASES)
def test_glob_escape_golden(inp: str, expected: str) -> None:
    assert glob_escape(inp) == expected


# reference test_glob_typetag.cpp:29-56 (db :30-34)
TYPETAG_DB = {"cpp": "*.cpp,*.cxx,*.hpp,*.hxx", "hpp": "*.hpp,*.hxx", "c": "*.c,*.h"}
TYPETAG_CASES = [
    ("", []),
    ("*", ["*"]),
    ("#", ["#"]),
    ("*.py", ["*.py"]),
    ("*,-*.py", ["*", "-*.py"]),
    ("#cpp", ["*.cpp", "*.cxx", "*.hpp", "*.hxx"]),
    ("-#cpp", ["-*.cpp", "-*.cxx", "-*.hpp", "-*.hxx"]),
    ("#c,#cpp", ["*.c", "*.h", "*.cpp", "*.cxx", "*.hpp", "*.hxx"]),
    ("#cpp,-*.cpp", ["*.cpp", "*.cxx", "*.hpp", "*.hxx", "-*.cpp"]),
    ("#cpp,-#hpp", ["*.cpp", "*.cxx", "*.hpp", "*.hxx", "-*.hpp", "-*.hxx"]),
    ("\\#comment", ["\\#comment"]),
    ("#unknown", ["#unknown"]),
]


@pytest.mark.parametrize("globs,expected", TYPETAG_CASES)
def test_typetag_golden(globs: str, expected: list[str]) -> None:
    db = TypetagDatabase(TYPETAG_DB)
    assert db.expand(split(globs)) == expected


def test_typetag_empty_glob() -> None:
    # reference test_glob_typetag.cpp:65-68
    assert TypetagDatabase({}).expand([""]) == [""]
