"""Property-based hardening (hypothesis) for the semantic kernel and
corpus generator invariants."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from glug_spark.semantics.glob import (
    decompose,
    full_match_regex,
    glob_escape,
    split,
    to_regex,
)

# characters that keep generated globs in well-formed territory (no
# reversed ranges — those are rejected by every regex engine)
_SAFE = st.text(
    alphabet="abcXYZ019._-~ ", min_size=0, max_size=12
)


@given(_SAFE)
@settings(max_examples=300, deadline=None)
def test_glob_escape_self_match(s: str) -> None:
    """glob_escape(s) compiled as a glob must full-match exactly s
    (the reference uses this to splice literal anchor paths —
    src/filter.cpp:52-53)."""
    pattern = to_regex(glob_escape(s))
    assert re.fullmatch(pattern, s), (s, pattern)


@given(_SAFE)
@settings(max_examples=300, deadline=None)
def test_literal_glob_matches_only_itself(s: str) -> None:
    pattern = re.compile(full_match_regex(glob_escape(s)))
    assert pattern.fullmatch(s)
    assert not pattern.fullmatch(s + "x")
    assert not pattern.fullmatch("x" + s)


@given(st.lists(st.text(alphabet="abc*?.!", min_size=1, max_size=6), max_size=5))
@settings(max_examples=200, deadline=None)
def test_split_roundtrip(tokens: list[str]) -> None:
    """Joining escape-free tokens with ',' then splitting recovers them
    (empties dropped, per reference semantics)."""
    joined = ",".join(tokens)
    assert split(joined) == [t for t in tokens if t]


@given(st.text(alphabet="abc/!#\\ ", min_size=0, max_size=10))
@settings(max_examples=300, deadline=None)
def test_decompose_never_crashes_and_strips(line: str) -> None:
    for mode in ("ignore", "select"):
        d = decompose(line, mode)  # type: ignore[arg-type]
        # invariants: pattern never starts with '/', never ends with
        # unescaped bare '/', empty pattern ⇒ all flags false
        assert not d.pattern.startswith("/")
        if not d.pattern:
            assert not (d.is_inverted or d.is_anchored or d.is_directory)
        # trailing-space invariant (reference test_glob_decompose.cpp:23-48).
        # NOT asserted for lines ending in '\': the appended space becomes
        # an ESCAPED space and is legitimately kept (same in the
        # reference's strip loop, src/glob.cpp:33-35 — hypothesis found
        # this edge; the reference's own table never tests a bare '\').
        if not line.endswith("\\"):
            assert decompose(line + " ", mode) == d  # type: ignore[arg-type]


def test_corpus_gen_zipf_head_skew() -> None:
    """The bench corpus must exercise head-term skew: the top stopword
    appears in the large majority of docs (FIXTURES.md §1)."""
    import numpy as np

    from glug_spark.corpus_gen import STOPHEAD, _doc_text, _vocab

    vocab = _vocab()
    hits = 0
    n = 300
    for doc_id in range(n):
        rng = np.random.default_rng((42 << 34) ^ doc_id)
        text = _doc_text(rng, vocab)
        if STOPHEAD[0] in text.split():
            hits += 1
    assert hits / n > 0.8, hits
