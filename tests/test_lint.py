"""The lint gate runs as part of the suite (the reference wires its
flake8/mypy/encoding lints into CI the same way — setup.cfg:7-14,
tools/encoding.py; tools/lint_gate.py is the stdlib-only analog)."""

from __future__ import annotations

import io
import sys


def test_lint_gate_clean():
    sys.path.insert(0, "/root/repo/tools")
    import lint_gate

    buf = io.StringIO()
    stdout = sys.stdout
    sys.stdout = buf
    try:
        rc = lint_gate.main()
    finally:
        sys.stdout = stdout
    assert rc == 0, f"lint findings:\n{buf.getvalue()}"
