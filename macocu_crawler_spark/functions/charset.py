"""chared-equivalent charset detection from byte trigrams.

The reference decodes HTML with precedence chared → meta → utf-8
(process.py:170-214); chared (a published tool) classifies the raw bytes
with per-language models trained offline.  chared is not installable in
this environment, so this module rebuilds the same INTERFACE from first
principles:

- for each candidate encoding, a byte-trigram model is built by encoding
  the configured languages' samples (data/lang_samples/*) in that encoding
- only trigrams containing at least one non-ASCII byte are modelled — the
  encodings differ ONLY there, and this makes the detector immune to
  markup/ASCII noise entirely
- ``classify(bytes)`` ranks candidates by cosine difference between the
  page's non-ASCII byte trigrams and each model; a pure-ASCII page has no
  evidence and classifies as utf-8

Known, documented divergences from real chared: one multi-language model
instead of per-language models (keeps extraction language-independent, the
optimisation any2txt relies on), and a candidate list limited to the
encodings the fixture languages can show evidence for.  Where the page
carries no non-ASCII evidence all candidates decode identically, so the
divergence cannot change extracted text — only the enc_chared attribute.
"""

from __future__ import annotations

import re
from collections import Counter
from functools import lru_cache
from importlib import resources
from math import sqrt

# candidate order is the tie-break (utf-8 preferred; iso-8859-1 before its
# cp1252 superset — they encode the sample identically, so ties are real)
CANDIDATE_ENCODINGS = ("utf-8", "iso-8859-1", "cp1252", "iso-8859-2")

_NON_ASCII_RE = re.compile(rb"[\x80-\xff]")
_MAX_EVIDENCE_POSITIONS = 4000  # cap per page: plenty of signal, bounded work


def _byte_trigrams(data: bytes, max_positions: int = _MAX_EVIDENCE_POSITIONS) -> Counter:
    """Trigram counts over windows containing ≥1 non-ASCII byte."""
    n = len(data)
    starts: set[int] = set()
    for k, m in enumerate(_NON_ASCII_RE.finditer(data)):
        if k >= max_positions:
            break
        i = m.start()
        starts.update((i - 2, i - 1, i))
    return Counter(data[s : s + 3] for s in starts if 0 <= s <= n - 3)


def _cos_diff(a: Counter, b: Counter) -> float:
    if not a or not b:
        return 1.0
    small, big = (a, b) if len(a) <= len(b) else (b, a)
    dot = sum(v * big.get(k, 0) for k, v in small.items())
    na = sqrt(sum(v * v for v in a.values()))
    nb = sqrt(sum(v * v for v in b.values()))
    return 1.0 - dot / (na * nb)


@lru_cache(maxsize=None)
def _encoding_models_for(langs: tuple[str, ...]) -> dict[str, Counter]:
    sample = "\n".join(
        resources.files("macocu_crawler_spark")
        .joinpath("data", "lang_samples", lang)
        .read_text(encoding="utf-8")
        for lang in langs
    )
    models = {}
    for enc in CANDIDATE_ENCODINGS:
        models[enc] = _byte_trigrams(
            sample.encode(enc, errors="replace"), max_positions=10**9
        )
    return models


def _encoding_models() -> dict[str, Counter]:
    """Models keyed by the *current* config.LANGUAGES — changing the
    configured languages after warm-up picks up fresh models (the cache is
    keyed on the tuple, so no manual cache_clear protocol is needed)."""
    from .. import config

    return _encoding_models_for(tuple(config.LANGUAGES))


def detect_encodings(data: bytes) -> list[str]:
    """Ranked candidate encodings for raw page bytes (chared's classify
    interface).  Empty evidence → ['utf-8']."""
    page = _byte_trigrams(data)
    if not page:
        return ["utf-8"]
    models = _encoding_models()
    ranked = sorted(
        (round(_cos_diff(page, models[enc]), 9), i, enc)
        for i, enc in enumerate(CANDIDATE_ENCODINGS)
    )
    return [enc for _d, _i, enc in ranked]
