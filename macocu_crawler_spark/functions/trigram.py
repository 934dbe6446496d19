"""Character-trigram language model.

Reproduces the math of the reference's util/trigrams.py (itself the classic
ActiveState recipe 326576): frequencies of 3-character windows over
whitespace-normalised text, compared by cosine; difference = 1 - cosine.

Semantics mirrored exactly (trigrams.py:43-84):
- each input line is whitespace-collapsed to single spaces; blank lines skipped
- characters are consumed from ``line.strip() + ' '`` with a 2-char context
  that starts as two spaces and *carries across lines*
- similarity = dot product over common trigrams / (|a| * |b|)

The storage differs (flat dict keyed by the 3-char window instead of nested
dicts) — same vector, same cosine.
"""

from __future__ import annotations

import re

_SPACE_RE = re.compile(r"\s+")


class TrigramModel:
    __slots__ = ("counts", "norm")

    def __init__(self, text: str | None = None):
        self.counts: dict[str, int] = {}
        self.norm = 0.0
        if text is not None:
            self.add_lines([text])

    def add_lines(self, lines) -> "TrigramModel":
        counts = self.counts
        context = "  "
        for line in lines:
            line = _SPACE_RE.sub(" ", line)
            if not line.strip():
                continue
            for ch in line.strip() + " ":
                tri = context + ch
                counts[tri] = counts.get(tri, 0) + 1
                context = context[1] + ch
        self.norm = sum(c * c for c in counts.values()) ** 0.5
        return self

    def similarity(self, other: "TrigramModel") -> float:
        if not self.norm or not other.norm:
            return 0.0
        a, b = self.counts, other.counts
        if len(b) < len(a):
            a, b = b, a
        dot = 0
        for tri, ca in a.items():
            cb = b.get(tri)
            if cb:
                dot += ca * cb
        return dot / (self.norm * other.norm)

    def diff(self, other: "TrigramModel") -> float:
        """1 = entirely different, 0 = identical ratio of trigrams."""
        return 1 - self.similarity(other)


def lang_difference(model: TrigramModel, text: str) -> float:
    """Reference process.py:123-127: build a trigram vector from the text and
    return its difference against the language model."""
    return model.diff(TrigramModel(text))
