"""End-to-end explorer listings ported from the reference
(test/unit/test_filesystem_explorer.cpp:95-472): nested gitignores,
CRLF rules, unicode names, negation override, anchored rules in
``~``/``[]`` directories, .git exclusion, symlinks, outer filters,
repo-root barriers, submodule skipping — each as a table fixture run
through operators.explorer.explore, expected output order-sensitive
(files-first lexicographic DFS).
"""

from __future__ import annotations

import pytest

from glug_spark.operators.explorer import explore

# (case_id, entries [(path, kind, content)], root, expected ordered paths)
CASES = [
    (
        "simple",
        [("simple", "dir", None), ("simple/README.md", "file", None)],
        "simple",
        ["simple/README.md"],
    ),
    (
        "with_gitignore",
        [
            ("with_gitignore", "dir", None),
            ("with_gitignore/README.md", "file", None),
            ("with_gitignore/build.log", "file", None),
            ("with_gitignore/.gitignore", "file", "# no logs\n\n*.log"),
        ],
        "with_gitignore",
        ["with_gitignore/.gitignore", "with_gitignore/README.md"],
    ),
    (
        "with_gitignore_crlf",
        [
            ("c", "dir", None),
            ("c/README.md", "file", None),
            ("c/build.log", "file", None),
            ("c/.gitignore", "file", "# no logs\r\n\r\n*.log\r\n"),
        ],
        "c",
        ["c/.gitignore", "c/README.md"],
    ),
    (
        "unicode_name",
        [
            ("u", "dir", None),
            ("u/translations", "dir", None),
            ("u/translations/українська.md", "file", None),
            ("u/translations/Ελληνική.md", "file", None),
            ("u/translations/한국어.md", "file", None),
            ("u/translations/generated.md", "file", None),
            ("u/translations/generate.sh", "file", None),
            ("u/.gitignore", "file", "generated*"),
        ],
        "u",
        [
            "u/.gitignore",
            "u/translations/generate.sh",
            "u/translations/Ελληνική.md",
            "u/translations/українська.md",
            "u/translations/한국어.md",
        ],
    ),
    (
        "nested",
        [
            ("nested", "dir", None),
            ("nested/README.md", "file", None),
            ("nested/.gitignore", "file", "*.log\n.cache/"),
            ("nested/src", "dir", None),
            ("nested/src/main.c", "file", None),
            ("nested/src/.gitignore", "file", "*.generated.*"),
            ("nested/src/main.generated.c", "file", None),
            ("nested/src/generated.log", "file", None),
            ("nested/build.log", "file", None),
            ("nested/.cache", "dir", None),
            ("nested/.cache/main.c.obj", "file", None),
        ],
        "nested",
        [
            "nested/.gitignore",
            "nested/README.md",
            "nested/src/.gitignore",
            "nested/src/main.c",
        ],
    ),
    (
        "negate_ignore",
        [
            ("n", "dir", None),
            ("n/.gitignore", "file", "*.zip"),
            ("n/result.zip", "file", None),
            ("n/test", "dir", None),
            ("n/test/.gitignore", "file", "!data.zip"),
            ("n/test/data.zip", "file", None),
        ],
        "n",
        ["n/.gitignore", "n/test/.gitignore", "n/test/data.zip"],
    ),
    (
        "all_ignored",
        [
            ("a", "dir", None),
            ("a/.gitignore", "file", "generated/*.h"),
            ("a/generated", "dir", None),
            ("a/generated/foo.h", "file", None),
            ("a/generated/bar.h", "file", None),
        ],
        "a",
        ["a/.gitignore"],
    ),
    (
        "anchored_tilde",
        [
            ("t", "dir", None),
            ("t/weird~", "dir", None),
            ("t/weird~/.gitignore", "file", "/ignore.txt"),
            ("t/weird~/ignore.txt", "file", None),
            ("t/weird~/include.txt", "file", None),
        ],
        "t",
        ["t/weird~/.gitignore", "t/weird~/include.txt"],
    ),
    (
        "anchored_brackets",
        [
            ("b", "dir", None),
            ("b/.gitignore", "file", "[weird]"),
            ("b/[weird]", "dir", None),
            ("b/[weird]/.gitignore", "file", "/ignore.txt"),
            ("b/[weird]/ignore.txt", "file", None),
            ("b/[weird]/include.txt", "file", None),
            ("b/[weird]/i", "file", None),
            ("b/w", "file", None),
            ("b/e", "file", None),
            ("b/i", "file", None),
            ("b/r", "file", None),
            ("b/d", "file", None),
            ("b/o", "file", None),
        ],
        "b",
        [
            "b/.gitignore",
            "b/o",
            "b/[weird]/.gitignore",
            "b/[weird]/include.txt",
        ],
    ),
    (
        "git_dir",
        [
            ("g", "dir", None),
            ("g/README.md", "file", None),
            ("g/.git", "dir", None),
            ("g/.git/HEAD", "file", None),
        ],
        "g",
        ["g/README.md"],
    ),
    (
        "symlinks",
        [
            ("s", "dir", None),
            ("s/docs", "dir", None),
            ("s/docs/README.md", "file", None),
            ("s/documentation", "link", None),
            ("s/README.md", "link", None),
        ],
        "s",
        ["s/docs/README.md"],
    ),
    (
        "outer_filters",
        [
            ("outer", "dir", None),
            ("outer/.gitignore", "file", "*.log\n*.zip"),
            ("outer/middle", "dir", None),
            ("outer/middle/.gitignore", "file", "!*.zip"),
            ("outer/middle/inner", "dir", None),
            ("outer/middle/inner/out.log", "file", None),
            ("outer/middle/inner/README.md", "file", None),
            ("outer/middle/inner/thingy.zip", "file", None),
        ],
        "outer/middle/inner",
        [
            "outer/middle/inner/README.md",
            "outer/middle/inner/thingy.zip",
        ],
    ),
    (
        "outer_with_git_barrier",
        [
            ("o", "dir", None),
            ("o/.gitignore", "file", "*.log"),
            ("o/middle", "dir", None),
            ("o/middle/.git", "dir", None),
            ("o/middle/inner", "dir", None),
            ("o/middle/inner/out.log", "file", None),
            ("o/middle/inner/README.md", "file", None),
        ],
        "o/middle/inner",
        ["o/middle/inner/README.md", "o/middle/inner/out.log"],
    ),
    (
        "repo_with_submodule",
        [
            ("r", "dir", None),
            ("r/.git", "dir", None),
            ("r/.gitignore", "file", "*.log"),
            ("r/excluded.log", "file", None),
            ("r/included.txt", "file", None),
            ("r/submodules", "dir", None),
            ("r/submodules/.git", "dir", None),
            ("r/submodules/.gitignore", "file", "*.txt"),
            ("r/submodules/excluded.txt", "file", None),
            ("r/submodules/included.log", "file", None),
        ],
        "r",
        ["r/.gitignore", "r/included.txt"],
    ),
    (
        "projects_directory",
        [
            ("p", "dir", None),
            ("p/.gitignore", "file", "*.log"),
            ("p/first", "dir", None),
            ("p/first/.git", "dir", None),
            ("p/first/.gitignore", "file", "*.log"),
            ("p/first/README.md", "file", None),
            ("p/first/excluded.log", "file", None),
            ("p/second", "dir", None),
            ("p/second/.git", "dir", None),
            ("p/second/README.md", "file", None),
            ("p/second/included.log", "file", None),
            ("p/third", "dir", None),
            ("p/third/.git", "dir", None),
            ("p/third/README.md", "file", None),
            ("p/third/submodules", "dir", None),
            ("p/third/submodules/.git", "dir", None),
            ("p/third/submodules/README.md", "file", None),
        ],
        "p",
        [
            "p/.gitignore",
            "p/first/.gitignore",
            "p/first/README.md",
            "p/second/README.md",
            "p/second/included.log",
            "p/third/README.md",
        ],
    ),
    (
        "submodule_target_middle",
        [
            ("m", "dir", None),
            ("m/.git", "dir", None),
            ("m/README.md", "file", None),
            ("m/submodules", "dir", None),
            ("m/submodules/README.md", "file", None),
            ("m/submodules/dependency", "dir", None),
            ("m/submodules/dependency/.git", "dir", None),
            ("m/submodules/dependency/README.md", "file", None),
        ],
        "m/submodules",
        ["m/submodules/README.md"],
    ),
]


@pytest.mark.parametrize("case_id,entries,root,expected", CASES,
                         ids=[c[0] for c in CASES])
def test_explorer_listing(spark, case_id, entries, root, expected):
    df = spark.createDataFrame(entries, "path string, kind string, content string")
    actual = [r["path"] for r in explore(df, root).collect()]
    assert actual == expected, case_id


# --- remaining reference cases: empty-dir recursion + select filters ----
# (reference test_filesystem_explorer.cpp:206-224 and :519-558)

_SELECT_TREE_REL = [
    (".gitignore", "file", "*.generated.*\n*.log"),
    ("src", "dir", None),
    ("src/main.cpp", "file", None),
    ("src/foo.cpp", "file", None),
    ("include", "dir", None),
    ("include/foo.hpp", "file", None),
    ("include/foo.generated.hpp", "file", None),
    ("include/detail", "dir", None),
    ("include/detail/impl.hpp", "file", None),
    ("test", "dir", None),
    ("test/data", "dir", None),
    ("test/data/curl.py", "file", None),
    ("test/run.py", "file", None),
    ("test/results.log", "file", None),
    ("run_tests.py", "file", None),
]


def _select_tree(root: str):
    return [(root, "dir", None)] + [
        (f"{root}/{p}", k, c) for p, k, c in _SELECT_TREE_REL
    ]


EXTRA_CASES = [
    (
        "recurse_empty_after_empty",
        [
            ("r1", "dir", None),
            ("r1/a", "dir", None), ("r1/a/b", "dir", None),
            ("r1/a/b/c", "dir", None), ("r1/x", "dir", None),
        ],
        "r1", None, [],
    ),
    (
        "recurse_nonempty_after_empty",
        [
            ("r2", "dir", None),
            ("r2/a", "dir", None), ("r2/a/b", "dir", None),
            ("r2/a/b/c", "dir", None),
            ("r2/x", "dir", None), ("r2/x/y", "dir", None),
            ("r2/x/y/z", "file", None),
        ],
        "r2", None, ["r2/x/y/z"],
    ),
    (
        "select_cpp",
        _select_tree("select_cpp"), "select_cpp", "*.cpp,*.hpp,-main.*",
        [
            "select_cpp/include/foo.hpp",
            "select_cpp/include/detail/impl.hpp",
            "select_cpp/src/foo.cpp",
        ],
    ),
    (
        "select_dir",
        _select_tree("select_dir"), "select_dir", "test/",
        [
            # Selecting directory does not prevent searching root
            "select_dir/.gitignore",
            "select_dir/run_tests.py",
            "select_dir/test/run.py",
        ],
    ),
    (
        "select_dir_content",
        _select_tree("select_dir_content"), "select_dir_content", "test/*",
        ["select_dir_content/test/run.py"],
    ),
    (
        "select_dir_content_recursive",
        _select_tree("select_dir_content_recursive"),
        "select_dir_content_recursive", "test/**",
        [
            "select_dir_content_recursive/test/run.py",
            "select_dir_content_recursive/test/data/curl.py",
        ],
    ),
]


@pytest.mark.parametrize(
    "case_id,entries,root,select_expr,expected",
    EXTRA_CASES,
    ids=[c[0] for c in EXTRA_CASES],
)
def test_explorer_extra_reference_cases(
    spark, case_id, entries, root, select_expr, expected
):
    from glug_spark.operators.pathfilter import compile_select

    df = spark.createDataFrame(entries, "path string, kind string, content string")
    # anchored select patterns resolve against the explore root (the
    # reference CLI runs with cwd = tree root)
    select = compile_select(select_expr, anchor=root) if select_expr else None
    actual = [r["path"] for r in explore(df, root, select=select).collect()]
    assert actual == expected, case_id
