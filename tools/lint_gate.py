#!/usr/bin/env python
"""Lint gate — the sandbox analog of the reference's strict lint wall.

The reference enforces flake8 + mypy (setup.cfg:7-14), an encoding lint
(tools/encoding.py) and a license lint (tools/license.py) in CI. This
container has none of those tools and installing is off-limits, so this
gate implements the checks that matter most, stdlib-only:

1. **compile**: every ``.py`` file must byte-compile (syntax wall).
2. **encoding**: UTF-8-decodable, no BOM, LF-only line endings, no
   trailing whitespace on source lines (the reference's encoding lint).
3. **imports**: no unused module-level imports (the highest-signal
   pyflakes check; dead imports are how stale dependencies and renamed
   modules hide). ``__init__.py`` re-exports and ``__future__`` are
   exempt, as are names listed in ``__all__`` or marked ``# noqa``.
4. **bare except**: ``except:`` without an exception class is refused.

Run directly (exit 1 on any finding) or via tests/test_lint.py.
"""

from __future__ import annotations

import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: directories scanned for source files
SCAN = ["glug_spark", "tools", "tests", "__spark_entry__.py", "bench.py"]


def _py_files() -> list[str]:
    out = []
    for top in SCAN:
        full = os.path.join(REPO, top)
        if os.path.isfile(full):
            out.append(full)
            continue
        for root, dirs, files in os.walk(full):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            out.extend(
                os.path.join(root, f) for f in files if f.endswith(".py")
            )
    return sorted(out)


def check_compile(path: str, src: bytes) -> list[str]:
    try:
        compile(src, path, "exec")
        return []
    except SyntaxError as e:
        return [f"compile: {e.msg} at line {e.lineno}"]


def check_encoding(path: str, raw: bytes) -> list[str]:
    errs = []
    if raw.startswith(b"\xef\xbb\xbf"):
        errs.append("encoding: UTF-8 BOM")
    try:
        raw.decode("utf-8")
    except UnicodeDecodeError as e:
        return errs + [f"encoding: not UTF-8 ({e})"]
    if b"\r" in raw:
        errs.append("encoding: CR line ending (LF only)")
    for i, line in enumerate(raw.split(b"\n"), 1):
        if line != line.rstrip(b" \t"):
            errs.append(f"encoding: trailing whitespace at line {i}")
    return errs


class _ImportLint(ast.NodeVisitor):
    """Module-level imports vs every name used anywhere in the file."""

    def __init__(self) -> None:
        self.imports: dict[str, int] = {}  # bound name -> lineno
        self.used: set[str] = set()
        self.exported: set[str] = set()

    def visit_Import(self, node: ast.Import) -> None:
        for a in node.names:
            name = a.asname or a.name.split(".")[0]
            self.imports[name] = node.lineno

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        if node.module == "__future__":
            return
        for a in node.names:
            if a.name == "*":
                continue
            self.imports[a.asname or a.name] = node.lineno

    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        self.generic_visit(node)

    def visit_Assign(self, node: ast.Assign) -> None:
        for t in node.targets:
            if isinstance(t, ast.Name) and t.id == "__all__":
                try:
                    self.exported |= set(ast.literal_eval(node.value))
                except ValueError:
                    pass
        self.generic_visit(node)


def check_ast(path: str, src: str) -> list[str]:
    try:
        tree = ast.parse(src, filename=path)
    except SyntaxError:
        return []  # the compile check reports it
    errs = []
    noqa_lines = {
        i for i, line in enumerate(src.splitlines(), 1) if "# noqa" in line
    }
    lint = _ImportLint()
    lint.visit(tree)
    is_init = os.path.basename(path) == "__init__.py"
    if not is_init:
        for name, ln in sorted(lint.imports.items(), key=lambda kv: kv[1]):
            if name in lint.used or name in lint.exported:
                continue
            if ln in noqa_lines:
                continue
            errs.append(f"imports: unused import {name!r} at line {ln}")
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            if node.lineno not in noqa_lines:
                errs.append(f"except: bare `except:` at line {node.lineno}")
    return errs


def main() -> int:
    n_err = 0
    for path in _py_files():
        with open(path, "rb") as f:
            raw = f.read()
        errs = check_compile(path, raw)
        errs += check_encoding(path, raw)
        errs += check_ast(path, raw.decode("utf-8", errors="replace"))
        for e in errs:
            print(f"{os.path.relpath(path, REPO)}: {e}")
        n_err += len(errs)
    if n_err:
        print(f"FAIL: {n_err} lint finding(s)")
        return 1
    print(f"OK: {len(_py_files())} files clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
