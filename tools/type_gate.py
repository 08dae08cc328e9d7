#!/usr/bin/env python
"""Type gate — the sandbox analog of the reference's strict mypy wall.

The reference runs ``mypy --strict`` in CI (setup.cfg:5-9); mypy is not
installable in this container, so this gate enforces the highest-signal
strict-mode checks stdlib-only, over the ENTIRE ``glug_spark`` package:

1. **annotation presence** (``disallow_untyped_defs`` analog): every
   ``def`` — public, private, nested, methods — must annotate all
   parameters (``self``/``cls`` exempt) and the return type. Escape
   hatch: ``# noqa: type`` on the ``def`` line.
2. **implicit Optional ban** (``no_implicit_optional``): a parameter
   defaulting to ``None`` must spell ``None`` in its annotation
   (``X | None`` / ``Optional[X]``).
3. **call-signature consistency**: every call site inside the package
   that statically resolves to a package-defined function (same-module
   name, ``from mod import name``, or ``mod.name`` via an imported
   module alias) is checked against that function's signature — too
   many positionals, missing required parameters, unknown or duplicate
   keywords are refused. Call sites using ``*args``/``**kwargs``
   spreads are skipped (not statically checkable here).

Run directly (exit 1 on any finding) or via tests/test_lint.py.
"""

from __future__ import annotations

import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "glug_spark"


def _py_files() -> list[str]:
    out = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        out.extend(
            os.path.join(root, f) for f in files if f.endswith(".py")
        )
    return sorted(out)


def _module_name(path: str) -> str:
    rel = os.path.relpath(path, REPO)[:-3].replace(os.sep, ".")
    return rel[:-9] if rel.endswith(".__init__") else rel


class FuncSig:
    """The statically checkable surface of one function def."""

    def __init__(self, node: ast.FunctionDef | ast.AsyncFunctionDef) -> None:
        a = node.args
        self.name = node.name
        self.lineno = node.lineno
        self.posonly = [p.arg for p in a.posonlyargs]
        self.pos = [p.arg for p in a.args]
        self.kwonly = [p.arg for p in a.kwonlyargs]
        self.has_vararg = a.vararg is not None
        self.has_kwarg = a.kwarg is not None
        n_pos = len(self.posonly) + len(self.pos)
        self.required_pos = n_pos - len(a.defaults)
        self.required_kwonly = {
            p.arg
            for p, d in zip(a.kwonlyargs, a.kw_defaults)
            if d is None
        }
        self.optional_pos = set(
            (self.posonly + self.pos)[self.required_pos:]
        )
        # decorators may change the callable's signature (pandas_udf
        # keeps arity; others may not) — flag for leniency
        self.decorated = bool(node.decorator_list)

    def check_call(self, call: ast.Call, is_method: bool) -> str | None:
        if any(isinstance(x, ast.Starred) for x in call.args):
            return None
        if any(kw.arg is None for kw in call.keywords):  # **spread
            return None
        n_given = len(call.args) + (1 if is_method else 0)
        cap = len(self.posonly) + len(self.pos)
        if n_given > cap and not self.has_vararg:
            return (
                f"{n_given} positional args but {self.name}() takes "
                f"at most {cap}"
            )
        kwnames = [kw.arg for kw in call.keywords]
        if len(set(kwnames)) != len(kwnames):
            return f"duplicate keyword in call to {self.name}()"
        valid_kw = set(self.pos) | set(self.kwonly)
        for kw in kwnames:
            if kw not in valid_kw and not self.has_kwarg:
                return f"unknown keyword {kw!r} in call to {self.name}()"
            if kw in self.posonly and not self.has_kwarg:
                return (
                    f"positional-only parameter {kw!r} passed by "
                    f"keyword to {self.name}()"
                )
        # every required positional must be covered (positionally or kw)
        names_in_order = self.posonly + self.pos
        for i, pname in enumerate(names_in_order[: self.required_pos]):
            if i < n_given or pname in kwnames:
                continue
            return (
                f"missing required argument {pname!r} in call to "
                f"{self.name}()"
            )
        for pname in sorted(self.required_kwonly):
            if pname not in kwnames:
                return (
                    f"missing required keyword-only argument {pname!r} "
                    f"in call to {self.name}()"
                )
        return None


def _ann_contains_none(ann: ast.expr) -> bool:
    for n in ast.walk(ann):
        if isinstance(n, ast.Constant) and (
            n.value is None or n.value == "None"
        ):
            return True
        if isinstance(n, ast.Name) and n.id in ("Optional", "Any"):
            return True
        if isinstance(n, ast.Attribute) and n.attr in ("Optional", "Any"):
            return True
        # string annotations (future import): parse and recurse
        if isinstance(n, ast.Constant) and isinstance(n.value, str):
            try:
                sub = ast.parse(n.value, mode="eval").body
            except SyntaxError:
                continue
            if _ann_contains_none(sub):
                return True
    return False


def check_annotations(path: str, tree: ast.Module, src: str) -> list[str]:
    errs = []
    noqa = {
        i for i, line in enumerate(src.splitlines(), 1)
        if "# noqa: type" in line
    }
    for node in ast.walk(tree):
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        if node.lineno in noqa:
            continue
        a = node.args
        params = a.posonlyargs + a.args + a.kwonlyargs
        missing = [
            p.arg for p in params
            if p.annotation is None and p.arg not in ("self", "cls")
        ]
        if a.vararg is not None and a.vararg.annotation is None:
            missing.append("*" + a.vararg.arg)
        if a.kwarg is not None and a.kwarg.annotation is None:
            missing.append("**" + a.kwarg.arg)
        if missing:
            errs.append(
                f"types: untyped parameter(s) {missing} on "
                f"{node.name}() at line {node.lineno}"
            )
        if node.returns is None and node.name != "__init__":
            errs.append(
                f"types: missing return annotation on {node.name}() "
                f"at line {node.lineno}"
            )
        # implicit-Optional ban
        pos_params = a.posonlyargs + a.args
        for p, d in zip(pos_params[len(pos_params) - len(a.defaults):],
                        a.defaults):
            if (isinstance(d, ast.Constant) and d.value is None
                    and p.annotation is not None
                    and not _ann_contains_none(p.annotation)):
                errs.append(
                    f"types: parameter {p.arg!r} of {node.name}() "
                    f"defaults to None but annotation omits None "
                    f"(line {node.lineno})"
                )
        for p, d in zip(a.kwonlyargs, a.kw_defaults):
            if (d is not None and isinstance(d, ast.Constant)
                    and d.value is None and p.annotation is not None
                    and not _ann_contains_none(p.annotation)):
                errs.append(
                    f"types: keyword-only {p.arg!r} of {node.name}() "
                    f"defaults to None but annotation omits None "
                    f"(line {node.lineno})"
                )
    return errs


def _collect_defs(trees: dict[str, ast.Module]) -> dict[str, FuncSig]:
    """module-level function defs: '<module>.<func>' → FuncSig."""
    defs: dict[str, FuncSig] = {}
    for mod, tree in trees.items():
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                defs[f"{mod}.{node.name}"] = FuncSig(node)
    return defs


class _CallChecker(ast.NodeVisitor):
    def __init__(self, mod: str, defs: dict[str, FuncSig],
                 modules: set[str]) -> None:
        self.mod = mod
        self.defs = defs
        self.modules = modules
        self.local_names: dict[str, str] = {}   # name -> fq func
        self.mod_aliases: dict[str, str] = {}   # alias -> fq module
        self.shadowed: set[str] = set()
        self.errs: list[str] = []

    def visit_Import(self, node: ast.Import) -> None:
        for a in node.names:
            if a.name.startswith(PKG):
                self.mod_aliases[a.asname or a.name.split(".")[0]] = a.name

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        if node.module is None or not node.module.startswith(PKG):
            return
        for a in node.names:
            bound = a.asname or a.name
            fq = f"{node.module}.{a.name}"
            if fq in self.defs:
                self.local_names[bound] = fq
            elif fq in self.modules:
                self.mod_aliases[bound] = fq

    def visit_Assign(self, node: ast.Assign) -> None:
        for t in node.targets:
            if isinstance(t, ast.Name):
                self.shadowed.add(t.id)
        self.generic_visit(node)

    def visit_Call(self, node: ast.Call) -> None:
        sig = None
        f = node.func
        if isinstance(f, ast.Name):
            fq = self.local_names.get(f.id)
            if fq is None and f.id not in self.shadowed:
                fq = f"{self.mod}.{f.id}"
            sig = self.defs.get(fq) if fq else None
        elif isinstance(f, ast.Attribute) and isinstance(f.value, ast.Name):
            alias = self.mod_aliases.get(f.value.id)
            if alias:
                sig = self.defs.get(f"{alias}.{f.attr}")
        if sig is not None and not sig.decorated:
            err = sig.check_call(node, is_method=False)
            if err:
                self.errs.append(
                    f"call: {err} at line {node.lineno} "
                    f"(defined {sig.name}:{sig.lineno})"
                )
        self.generic_visit(node)


def main() -> int:
    files = _py_files()
    trees: dict[str, ast.Module] = {}
    srcs: dict[str, str] = {}
    for path in files:
        with open(path, encoding="utf-8") as fh:
            src = fh.read()
        mod = _module_name(path)
        trees[mod] = ast.parse(src, filename=path)
        srcs[mod] = src

    defs = _collect_defs(trees)
    modules = set(trees)
    n_err = 0
    for path in files:
        mod = _module_name(path)
        errs = check_annotations(path, trees[mod], srcs[mod])
        checker = _CallChecker(mod, defs, modules)
        checker.visit(trees[mod])
        errs += checker.errs
        for e in errs:
            print(f"{os.path.relpath(path, REPO)}: {e}")
        n_err += len(errs)
    if n_err:
        print(f"FAIL: {n_err} type finding(s)")
        return 1
    print(f"OK: {len(files)} files, {len(defs)} module-level defs typed "
          "and call-consistent")
    return 0


if __name__ == "__main__":
    sys.exit(main())
