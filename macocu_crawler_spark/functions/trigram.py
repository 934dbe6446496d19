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
from collections import Counter

_SPACE_RE = re.compile(r"\s+")


class TrigramModel:
    __slots__ = ("counts", "norm")

    def __init__(self, text: str | None = None):
        self.counts: dict[str, int] = {}
        self.norm = 0.0
        if text is not None:
            self.add_lines([text])

    def add_lines(self, lines) -> "TrigramModel":
        """Count every 3-char window of the normalised stream.

        Equivalent to the reference's per-char context walk (trigrams.py:
        43-55): each non-blank line contributes ``line.strip() + ' '`` to a
        stream prefixed with two spaces; the trigrams are exactly the
        sliding windows of that stream.  Implemented as one C-level
        zip/Counter pass — same counts, ~5× less interpreter work (this is
        the hottest loop of the whole page pipeline).
        """
        parts = []
        for line in lines:
            line = _SPACE_RE.sub(" ", line).strip()
            if line:
                parts.append(line + " ")
        stream = "  " + "".join(parts)
        if len(stream) > 2:
            windows = Counter(map("".join, zip(stream, stream[1:], stream[2:])))
            counts = self.counts
            if counts:
                for tri, n in windows.items():
                    counts[tri] = counts.get(tri, 0) + n
            else:
                counts.update(windows)
        self.norm = sum(c * c for c in self.counts.values()) ** 0.5
        return self

    def similarity(self, other: "TrigramModel") -> float:
        if not self.norm or not other.norm:
            return 0.0
        a, b = self.counts, other.counts
        if len(b) < len(a):
            a, b = b, a
        bget = b.get
        dot = 0
        for tri, ca in a.items():
            cb = bget(tri)
            if cb:
                dot += ca * cb
        return dot / (self.norm * other.norm)

    def diff(self, other: "TrigramModel") -> float:
        """1 = entirely different, 0 = identical ratio of trigrams."""
        return 1 - self.similarity(other)


class UnigramModel(TrigramModel):
    """1-gram variant for scripts without useful trigram statistics
    (Chinese/Japanese/Korean) — reference util/trigrams1.py, selected via
    config.UNIGRAM_MODELS.  Same cosine math over single-character counts
    of the normalised stream (each line contributes ``strip() + ' '``)."""

    def add_lines(self, lines) -> "TrigramModel":
        parts = []
        for line in lines:
            line = _SPACE_RE.sub(" ", line).strip()
            if line:
                parts.append(line + " ")
        stream = "".join(parts)
        if stream:
            windows = Counter(stream)
            counts = self.counts
            if counts:
                for ch, n in windows.items():
                    counts[ch] = counts.get(ch, 0) + n
            else:
                counts.update(windows)
        self.norm = sum(c * c for c in self.counts.values()) ** 0.5
        return self


def model_class():
    """The configured n-gram model (process.py:42-45 import switch)."""
    from .. import config

    return UnigramModel if getattr(config, "UNIGRAM_MODELS", False) else TrigramModel


def lang_difference(model: TrigramModel, text: str) -> float:
    """Reference process.py:123-127: build a vector from the text and
    return its difference against the language model."""
    return model.diff(type(model)(text))
