"""Last-match-wins ignore/select filters over POSIX-style paths.

Behavioral parity with the reference's filter layer (semantics specified
by src/filter.cpp:47-186 and the decision tables in
test/unit/test_filter_ignore.cpp / test_filter_select.cpp). This is the
plan-time / oracle implementation; the distributed form compiles the same
rules to regex columns and resolves priority with ``array_max`` over
matching rule indices (see glug_spark.operators.pathfilter).

Decision model (include/glug/filter.hpp:19-37): tri-state —
``undecided`` defers to outer scopes, ``included`` stops the outer walk,
``excluded`` drops the entry.
"""

from __future__ import annotations

import enum
import re
from dataclasses import dataclass

from glug_spark.semantics.glob import (
    Decomposition,
    decompose,
    glob_escape,
    split,
    to_regex,
)


class Decision(enum.Enum):
    UNDECIDED = "undecided"
    EXCLUDED = "excluded"
    INCLUDED = "included"


def _basename(path: str) -> str:
    return path.rsplit("/", 1)[-1]


@dataclass(frozen=True)
class _Item:
    is_inverted: bool
    is_anchored: bool
    is_directory: bool
    regex: "re.Pattern[str]"
    pattern: str  # compiled regex source, for Spark-side reuse


def _compile_items(
    decomps: list[Decomposition], anchor: str, keep_directory_flag: bool
) -> list[_Item]:
    anchor_prefix = glob_escape(anchor) + "/"
    items: list[_Item] = []
    for d in decomps:
        pattern = d.pattern
        if d.is_anchored:
            pattern = anchor_prefix + pattern
        regex_src = to_regex(pattern)
        items.append(
            _Item(
                d.is_inverted,
                d.is_anchored,
                d.is_directory if keep_directory_flag else False,
                re.compile(regex_src),
                regex_src,
            )
        )
    return items


def _as_decomps(
    globs: list[str] | list[Decomposition], mode: str
) -> list[Decomposition]:
    return [
        g if isinstance(g, Decomposition) else decompose(g, mode)  # type: ignore[arg-type]
        for g in globs
    ]


class IgnoreFilter:
    """One ``.gitignore``-style rule list, anchored at a directory.

    ``apply`` resolves last-match-wins: scan rules in reverse, first hit
    decides (inverted → INCLUDED else EXCLUDED); directory-only rules
    skip files; anchored rules match the full path, unanchored the
    basename; no hit → UNDECIDED.
    """

    def __init__(
        self, globs: list[str] | list[Decomposition], anchor: str = ""
    ) -> None:
        self.items = _compile_items(
            _as_decomps(globs, "ignore"), anchor, keep_directory_flag=True
        )

    def apply(self, path: str, is_dir: bool) -> Decision:
        name = _basename(path)
        for item in reversed(self.items):
            if item.is_directory and not is_dir:
                continue
            candidate = path if item.is_anchored else name
            if item.regex.fullmatch(candidate):
                return Decision.INCLUDED if item.is_inverted else Decision.EXCLUDED
        return Decision.UNDECIDED

    __call__ = apply


class SelectFilter:
    """User select expression: two rule lists (files, dirs) + fallbacks.

    Non-``/``-suffixed rules apply to files only; the per-kind fallback is
    EXCLUDED iff any positive rule of that kind exists, else UNDECIDED.
    An empty list for the entry's kind → UNDECIDED.
    """

    def __init__(
        self, globs: str | list[str] | list[Decomposition], anchor: str = ""
    ) -> None:
        if isinstance(globs, str):
            globs = split(globs)
        decomps = _as_decomps(globs, "select")

        self.files: list[_Item] = []
        self.dirs: list[_Item] = []
        self.files_fallback = Decision.UNDECIDED
        self.dirs_fallback = Decision.UNDECIDED

        anchor_prefix = glob_escape(anchor) + "/"
        for d in decomps:
            pattern = d.pattern
            if d.is_anchored:
                pattern = anchor_prefix + pattern
            regex_src = to_regex(pattern)
            item = _Item(
                d.is_inverted, d.is_anchored, d.is_directory,
                re.compile(regex_src), regex_src,
            )
            (self.dirs if d.is_directory else self.files).append(item)
            if not d.is_inverted:
                if d.is_directory:
                    self.dirs_fallback = Decision.EXCLUDED
                else:
                    self.files_fallback = Decision.EXCLUDED

    def apply(self, path: str, is_dir: bool) -> Decision:
        items = self.dirs if is_dir else self.files
        if not items:
            return Decision.UNDECIDED

        name = _basename(path)
        for item in reversed(items):
            candidate = path if item.is_anchored else name
            if item.regex.fullmatch(candidate):
                return Decision.EXCLUDED if item.is_inverted else Decision.INCLUDED
        return self.dirs_fallback if is_dir else self.files_fallback

    __call__ = apply
