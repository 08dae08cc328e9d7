"""Typetag expansion — ``#cpp`` → its glob set, ``-#cpp`` → negated set.

Plan-time only (runs on the query string, never on data). Parity with the
reference's typetag_database (src/glob.cpp:266-306); builtin tag table
from src/main.cpp:31-46.
"""

from __future__ import annotations

from glug_spark.semantics.glob import split

#: Builtin tag → comma-separated glob list (reference src/main.cpp:31-46).
BUILTIN_TAGS: dict[str, str] = {
    "asm": "*.asm,*.[sS]",
    "cpp": "*.cpp,*.cc,*.cxx,*.m,*.hpp,*.hh,*.h,*.hxx",
    "batch": "*.bat,*.cmd",
    "cc": "*.c,*.h,*.xs",
    "cmake": "CMakeLists.txt,*.cmake",
    "csharp": "*.cs",
    "hh": "*.h",
    "hpp": "*.hpp,*.hh,*.h,*.hxx",
    "lua": "*.lua",
    "make": "*.mk,*.mak,[mM]akefile,GNUmakefile",
    "md": "*.markdown,*.mdown,*.mdwn,*.mkdn,*.mkd,*.md",
    "python": "*.py",
    "shell": "*.sh,*.bash,*.csh,*.tcsh,*.ksh,*.zsh,*.fish",
    "vim": "*.vim",
}


class TypetagDatabase:
    """Map tag → positive/negative glob lists; expand tag tokens in place.

    Unknown tags and non-tag tokens pass through unchanged; ``\\#x`` is an
    escaped literal, not a tag.
    """

    def __init__(self, tags: dict[str, str] | None = None) -> None:
        self._map: dict[str, tuple[list[str], list[str]]] = {}
        for key, value in (tags if tags is not None else BUILTIN_TAGS).items():
            positive = split(value)
            negative = ["-" + v for v in positive]
            self._map[key] = (positive, negative)

    def expand(self, globs: list[str]) -> list[str]:
        result: list[str] = []
        for glob in globs:
            if not glob.startswith("#") and not glob.startswith("-#"):
                result.append(glob)
                continue
            inverted = glob[0] == "-"
            tag = glob[(1 if inverted else 0) + 1 :]
            entry = self._map.get(tag)
            if entry is None:
                result.append(glob)
                continue
            result.extend(entry[1] if inverted else entry[0])
        return result

    def expand_expression(self, expression: str) -> list[str]:
        """Split a comma-separated select expression, then expand tags."""
        return self.expand(split(expression))
