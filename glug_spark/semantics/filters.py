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


#: integer codes for the vectorized kernels (arrays of enums are slow)
DEC_UNDECIDED, DEC_EXCLUDED, DEC_INCLUDED = 0, 1, 2
_DECISION_OF_CODE = {
    DEC_UNDECIDED: Decision.UNDECIDED,
    DEC_EXCLUDED: Decision.EXCLUDED,
    DEC_INCLUDED: Decision.INCLUDED,
}


def _basename(path: str) -> str:
    return path.rsplit("/", 1)[-1]


def combine_patterns(patterns: list[str]) -> str:
    """One alternation matching iff ANY pattern full-matches. Each
    alternative is isolated with ``(?:…)`` so precedence can't leak;
    full-match anchoring makes the result order-independent."""
    return "|".join("(?:" + p + ")" for p in patterns)


@dataclass(frozen=True)
class _Run:
    """A maximal run of CONSECUTIVE same-decision rules: last-match-wins
    only needs to know WHICH DECISION matched last, so within such a run
    the individual rule is irrelevant and the whole run collapses into a
    handful of combined regexes — per candidate kind (basename vs full
    path) and per applicability (dir-only rules never match files, so
    files test the file-applicable subset). This is the engine's
    multi-pattern single-pass analog of the reference's hyperscan
    provider (reference src/regex/hyperscan.cpp:39-79,
    HS_FLAG_SINGLEMATCH over a compiled rule database): a 500-rule chain
    with no inversions becomes ONE scan of the candidate instead of 500.
    """

    is_inverted: bool
    #: combined patterns over ALL rules in the run (what a DIR tests)
    base_all: str | None
    path_all: str | None
    #: combined patterns over the non-dir-only subset (what a FILE tests)
    base_file: str | None
    path_file: str | None


def build_runs(items: list["_Item"], key_on_directory: bool = True) -> list[_Run]:
    # key_on_directory is kept for call-site clarity: lists that carry
    # no dir-only flags (SelectFilter kind lists) produce identical
    # all/file slots either way
    del key_on_directory
    grouped: list[tuple[bool, list[_Item]]] = []
    for item in items:
        if grouped and grouped[-1][0] == item.is_inverted:
            grouped[-1][1].append(item)
        else:
            grouped.append((item.is_inverted, [item]))
    runs = []
    for inv, its in grouped:

        def _comb(subset: list) -> str | None:
            pats = [i.pattern for i in subset]
            return combine_patterns(pats) if pats else None

        base_its = [i for i in its if not i.is_anchored]
        path_its = [i for i in its if i.is_anchored]
        runs.append(_Run(
            inv,
            _comb(base_its),
            _comb(path_its),
            _comb([i for i in base_its if not i.is_directory]),
            _comb([i for i in path_its if not i.is_directory]),
        ))
    return runs


def _runs_decide(runs: list[_Run], paths: pd.Series, names: pd.Series,
                 is_dir: np.ndarray,
                 plain: int, inverted: int, fallback: int) -> np.ndarray:
    """Vectorized last-match-wins over arrays of paths.

    ``paths``/``names``: pandas string Series (positionally aligned);
    ``is_dir``: bool ndarray. Scans RUNS in reverse — each run is one
    whole-array regex pass per candidate kind (two when the run mixes
    dir-only and plain rules and the batch holds both kinds) — and
    freezes rows at their first (reversed) hit, which is exactly the
    scalar reverse-scan semantics. Returns an int8 decision-code array.
    """
    import numpy as np

    n = len(paths)
    dec = np.full(n, fallback, dtype=np.int8)
    undecided = np.ones(n, dtype=bool)
    any_dir = bool(is_dir.any())
    all_dir = bool(is_dir.all())

    def _match(base_pat: str | None, path_pat: str | None) -> np.ndarray:
        m = np.zeros(n, dtype=bool)
        if base_pat is not None:
            m |= names.str.fullmatch(base_pat).to_numpy(dtype=bool)
        if path_pat is not None:
            m |= paths.str.fullmatch(path_pat).to_numpy(dtype=bool)
        return m

    for run in reversed(runs):
        if not undecided.any():
            break
        same = (run.base_all == run.base_file
                and run.path_all == run.path_file)
        if same:
            hit = _match(run.base_all, run.path_all)
        elif all_dir:
            hit = _match(run.base_all, run.path_all)
        elif not any_dir:
            hit = _match(run.base_file, run.path_file)
        else:
            hit = np.where(
                is_dir,
                _match(run.base_all, run.path_all),
                _match(run.base_file, run.path_file),
            )
        hit &= undecided
        dec[hit] = inverted if run.is_inverted else plain
        undecided &= ~hit
    return dec


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

    @property
    def runs(self) -> list[_Run]:
        if not hasattr(self, "_runs"):
            self._runs: list[_Run] = build_runs(self.items)
        return self._runs

    def apply_batch(self, paths: pd.Series, names: pd.Series,
                    is_dir: np.ndarray) -> np.ndarray:
        """Vectorized :meth:`apply` over arrays — one combined-regex
        pass per consecutive same-decision rule run, not one Python
        regex call per (path, rule). Returns int8 decision codes
        (DEC_UNDECIDED / DEC_EXCLUDED / DEC_INCLUDED)."""
        return _runs_decide(
            self.runs, paths, names, is_dir,
            plain=DEC_EXCLUDED, inverted=DEC_INCLUDED,
            fallback=DEC_UNDECIDED,
        )


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

    def _kind_runs(self, is_dir: bool) -> list[_Run]:
        attr = "_dir_runs" if is_dir else "_file_runs"
        if not hasattr(self, attr):
            items = self.dirs if is_dir else self.files
            setattr(self, attr, build_runs(items, key_on_directory=False))
        return getattr(self, attr)

    def apply_batch(self, paths: pd.Series, names: pd.Series,
                    is_dir: np.ndarray) -> np.ndarray:
        """Vectorized :meth:`apply`: files and dirs resolve against their
        own rule lists/fallbacks; an empty list for a kind → UNDECIDED."""
        import numpy as np

        n = len(paths)
        dec = np.full(n, DEC_UNDECIDED, dtype=np.int8)
        code_of = {
            Decision.UNDECIDED: DEC_UNDECIDED,
            Decision.EXCLUDED: DEC_EXCLUDED,
            Decision.INCLUDED: DEC_INCLUDED,
        }
        for kind_is_dir, items, fallback in (
            (False, self.files, self.files_fallback),
            (True, self.dirs, self.dirs_fallback),
        ):
            mask = is_dir if kind_is_dir else ~is_dir
            if not items or not mask.any():
                continue
            idx = np.flatnonzero(mask)
            sub = _runs_decide(
                self._kind_runs(kind_is_dir),
                paths.iloc[idx].reset_index(drop=True),
                names.iloc[idx].reset_index(drop=True),
                np.full(len(idx), kind_is_dir, dtype=bool),
                plain=DEC_INCLUDED, inverted=DEC_EXCLUDED,
                fallback=code_of[fallback],
            )
            dec[idx] = sub
        return dec
