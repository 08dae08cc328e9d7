"""CLI option-escape surface (reference src/main.cpp:112-126).

Escapes (--version/--license/--help-tags) must work as leading options
but never hijack a positional operand that happens to share their
spelling (e.g. a search query of '--version').
"""

from __future__ import annotations

import pytest

from glug_spark.cli import VERSION, main


def test_version_escape(capsys):
    assert main(["--version"]) == 0
    assert capsys.readouterr().out.strip() == VERSION


def test_license_escape(capsys):
    assert main(["--license"]) == 0
    assert "license" in capsys.readouterr().out.lower()


def test_help_tags_escape(capsys):
    assert main(["--help-tags"]) == 0
    out = capsys.readouterr().out
    assert "cpp" in out and "python" in out


def test_escape_after_subcommand_is_an_operand(capsys):
    # 'query --version' must reach argparse (which then fails on the
    # missing required --index), NOT print the version and exit 0
    with pytest.raises(SystemExit) as exc:
        main(["query", "--version"])
    assert exc.value.code != 0
    assert VERSION not in capsys.readouterr().out


def test_leading_escape_before_subcommand_still_works(capsys):
    assert main(["--version", "query", "whatever"]) == 0
    assert capsys.readouterr().out.strip() == VERSION
