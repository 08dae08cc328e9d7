"""CRLF-tolerant line splitting — the reference's only content tokenizer.

Parity with the reference's getline (src/filesystem.cpp:46-64): split on
``\\n``, strip exactly one trailing ``\\r`` per line, no other
normalization (no NFC, no case folding — byte fidelity is an invariant).
"""

from __future__ import annotations


def split_lines(text: str) -> list[str]:
    """Split on ``\\n``; strip one trailing ``\\r`` per line.

    A trailing ``\\n`` yields no empty final line (getline semantics: the
    loop ends when the stream is exhausted).
    """
    if not text:
        return []
    parts = text.split("\n")
    if parts and parts[-1] == "":
        parts.pop()
    return [p[:-1] if p.endswith("\r") else p for p in parts]


def read_lines(path: str) -> list[str]:
    """Read a rule file as lines, CRLF-tolerant, UTF-8 passthrough."""
    with open(path, "rb") as f:
        return split_lines(f.read().decode("utf-8", errors="surrogateescape"))
