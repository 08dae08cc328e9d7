"""Glob dialect kernel: decompose / split / to_regex / glob_escape.

Behavioral parity with the reference's glob layer (semantics specified by
/root/reference/src/glob.cpp:20-264 and the golden tables in
/root/reference/test/unit/test_glob_to_regex.cpp and
test_glob_decompose.cpp). Independent Python implementation — the emitted
regexes deliberately target the lowest-common-denominator dialect (no
lookahead, split ranges instead of char-class subtraction) so the same
pattern string behaves identically under Python ``re``, Java regex
(Spark ``rlike`` / ``regexp_full_match``) and RE2 (DuckDB) — that is the
property that lets the Spark plan stay JVM-side while the oracle runs the
very same pattern.

Two dialects:

- ``ignore`` (gitignore lines): ``#`` starts a comment, ``!`` inverts,
  non-``/``-suffixed patterns match files *and* directories.
- ``select`` (user filter expressions): no comments, ``-`` inverts,
  non-``/``-suffixed patterns match files only.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

DecomposeMode = Literal["ignore", "select"]

#: Regex metacharacters escaped by the kernel. NOTE: deliberately a
#: *different* set from Python's ``re.escape`` (e.g. space, ``#``, ``&``,
#: ``~`` are escaped; ``/`` is not) — reference parity requires this exact
#: set (reference src/glob.cpp:101-127).
_META = set(" #$&()*+.?[\\]^{|}~")


@dataclass(frozen=True)
class Decomposition:
    """Parsed IR of one glob line (reference include/glug/glob.hpp:17-22)."""

    pattern: str = ""
    is_inverted: bool = False
    is_anchored: bool = False
    is_directory: bool = False

    def __bool__(self) -> bool:
        return bool(self.pattern)


_EMPTY = Decomposition()


def decompose(glob: str, mode: DecomposeMode = "ignore") -> Decomposition:
    """Parse one glob line into its decomposition.

    Reference semantics (src/glob.cpp:20-59): strip one leading escape
    backslash, strip the inversion char (``!`` ignore / ``-`` select),
    strip unescaped trailing spaces, detect anchoring (a ``/`` anywhere
    but last position), detect directory-only (trailing ``/``), strip
    leading ``/`` runs. ``#``-lines are comments in ignore mode only.
    """
    if not glob:
        return _EMPTY
    if mode == "ignore" and glob[0] == "#":
        return _EMPTY

    inversion_char = "!" if mode == "ignore" else "-"
    is_inverted = glob[0] == inversion_char
    if glob[0] == "\\":
        glob = glob[1:]
    if is_inverted:
        glob = glob[1:]

    while glob.endswith(" ") and not glob.endswith("\\ "):
        glob = glob[:-1]

    if not glob:
        return _EMPTY

    slash = glob.find("/")
    is_anchored = slash != -1 and slash < len(glob) - 1
    is_directory = glob[-1] == "/"
    if is_directory:
        glob = glob[:-1]
    glob = glob.lstrip("/")

    if not glob:
        return _EMPTY

    return Decomposition(glob, is_inverted, is_anchored, is_directory)


def split(globs: str, delimiter: str = ",") -> list[str]:
    """Split a glob list on an unescaped delimiter, dropping empties.

    Escape-aware: a backslash escapes the next char (and itself), so
    ``a\\,b`` stays one token while ``a\\\\,b`` splits after the escaped
    backslash (reference src/glob.cpp:61-97).
    """
    if not globs:
        return []

    result: list[str] = []
    offset = 0
    size = 0
    escaped = False
    for c in globs:
        if c == "\\":
            size += 1
            escaped = not escaped
            continue
        if escaped or c != delimiter:
            size += 1
            escaped = False
            continue
        if size:
            result.append(globs[offset : offset + size])
        offset += size + 1
        size = 0
    if size:
        result.append(globs[offset : offset + size])
    return result


def _esc(c: str, hyphen: bool = True) -> str:
    if c in _META or (hyphen and c == "-"):
        return "\\" + c
    return c


def _escape(s: str, hyphen: bool = True) -> str:
    return "".join(_esc(c, hyphen) for c in s)


def _star_to_regex(glob: str, i: int) -> tuple[str, int]:
    """Translate a run of ``*`` at index i; returns (regex, chars consumed)."""
    j = i + 1
    while j < len(glob) and glob[j] == "*":
        j += 1
    count = j - i
    first = i == 0
    last = i + count >= len(glob)
    dir_left = not first and glob[i - 1] == "/"
    dir_right = not last and glob[i + count] == "/"
    bound_left = first or dir_left
    bound_right = last or dir_right

    if count == 2 and bound_left and bound_right:
        # ``**/`` consumes its slash: any chain of dirs, or none.
        return ("(.+/)?", count + 1) if dir_right else (".*", count)

    quantifier = "+" if bound_left and bound_right else "*"
    return ("[^/]" + quantifier, count)


def _range_to_regex(s: str) -> str:
    """Char-class body with ranges; ranges spanning ``/`` are split in two

    so ``/`` can never be matched, without negative lookahead (reference
    src/glob.cpp:172-193 — keeps patterns portable across regex engines).
    """
    out: list[str] = []
    i = 0
    while i < len(s):
        if i == len(s) - 1 or s[i + 1] != "-":
            out.append(_esc(s[i]))
            i += 1
            continue
        frm = s[i]
        to = s[i + 2]
        i += 3
        if frm > to or frm > "/" or to < "/":
            out.append(_esc(frm) + "-" + _esc(to))
        else:
            out.append(
                _esc(frm) + "-" + _esc(chr(ord("/") - 1))
                + _esc(chr(ord("/") + 1)) + "-" + _esc(to)
            )
    return "".join(out)


def _set_to_regex(glob: str, i: int) -> tuple[str, int]:
    """Translate a ``[...]`` / ``[!...]`` set at index i.

    Unterminated sets and sets containing ``/`` degrade to escaped
    literals; ``[!x]`` becomes ``[^/x]`` (reference src/glob.cpp:195-216).
    """
    negative = i + 1 < len(glob) and glob[i + 1] == "!"
    start = i + 2 + (1 if negative else 0)
    close = glob.find("]", start)

    if close == -1:
        return _escape(glob[i:]), len(glob) - i
    count = close - i + 1

    slash = glob.find("/", i)
    if slash != -1 and slash < close:
        return _escape(glob[i : i + count]), count

    inner = glob[i + 1 : close]
    if negative:
        return "[^/" + _escape(inner[1:], hyphen=False) + "]", count

    dash = glob.find("-", i + 2)
    if dash == -1 or dash > close - 2:
        return "[" + _escape(inner) + "]", count
    return "[" + _range_to_regex(inner) + "]", count


def to_regex(glob: str) -> str:
    """Compile a glob into the portable full-match regex dialect.

    The result is used *unanchored but full-matched*: callers wrap it as
    ``^(...)$`` for Spark ``rlike`` or use ``re.fullmatch`` /
    DuckDB ``regexp_full_match``. ``?`` → ``[^/]``; ``*`` runs per
    ``_star_to_regex``; no wildcard ever crosses ``/``.
    """
    s: list[str] = []
    i = 0
    while i < len(glob):
        c = glob[i]
        if c == "\\":
            s.append("\\")
            if i < len(glob) - 1:
                i += 1
                s.append(glob[i])
            else:
                s.append("\\")
        elif c == "?":
            s.append("[^/]")
        elif c == "*":
            part, consumed = _star_to_regex(glob, i)
            s.append(part)
            i += consumed - 1
        elif c == "[":
            part, consumed = _set_to_regex(glob, i)
            s.append(part)
            i += consumed - 1
        else:
            s.append(_esc(c))
        i += 1
    return "".join(s)


def literal_prefix(glob: str) -> str:
    """Longest literal prefix a glob-matching string must start with.

    Conservative (a shorter prefix is always safe): stops at the first
    wildcard (`*?[`) or backslash escape. Used to push a
    ``StringStartsWith`` predicate into the parquet scan so row-group
    stats on a term-sorted layout can skip non-matching groups — it
    never changes result sets (every glob match starts with its own
    literal prefix).
    """
    out: list[str] = []
    for c in glob:
        if c in "*?[\\":
            break
        out.append(c)
    return "".join(out)


def glob_escape(s: str) -> str:
    """Escape ``? * [`` so a literal string becomes a self-matching glob

    (used to splice anchor-directory prefixes onto anchored patterns;
    reference src/glob.cpp:248-264).
    """
    out: list[str] = []
    for c in s:
        if c in "?*[":
            out.append("\\")
        out.append(c)
    return "".join(out)


def full_match_regex(glob: str) -> str:
    """Glob → anchored regex string for Spark ``rlike`` / DuckDB."""
    return "^(" + to_regex(glob) + ")$"
