"""HTML → paragraphs → good/bad classification (jusText-style).

The reference delegates to the jusText library (process.py:47, 267-275,
361-375) with the thresholds from util/config.py:317-331.  jusText is not
available in this environment, so this module implements the same algorithm
from scratch on the stdlib ``html.parser``:

- ``make_paragraphs``: DOM walk; paragraphs break at block-level tags and at
  ``<br><br>``; characters inside ``<a>`` are counted toward link density;
  ``<script>/<style>/<head>`` content is dropped; the first ``<title>`` text
  is captured.
- ``classify_paragraphs``: context-free classes good/neargood/short/bad from
  length, stopword density and link density (jusText's published heuristic).
- ``revise_paragraph_classification``: context-sensitive revision (heading
  promotion within max_heading_distance chars, short/neargood paragraphs
  absorbed into surrounding good/bad blocks) — final classes good/bad.

Paragraphs are plain dicts with the exact keys the reference passes around
(process.py:294-299): text, word_count, linked_char_count, dom_path, plus
cfclass/class_/heading added by classification.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

SPACE_RE = re.compile(r"\s+")

# Tags that open/close a paragraph (block-level).
PARAGRAPH_TAGS = frozenset(
    """body blockquote caption center col colgroup dd div dl dt fieldset form
    h1 h2 h3 h4 h5 h6 legend li optgroup option p pre table td textarea tfoot
    th thead tr ul ol section article aside header footer main nav""".split()
)
# Content of these tags is discarded entirely.
IGNORE_CONTENT_TAGS = frozenset("script style head".split())
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
HEADING_RE = re.compile(r"(^h\d|\.h\d)")
SELECT_RE = re.compile(r"(^select|\.select)")
COPYRIGHT_CHAR = "\xa9"
COPYRIGHT_CODE = "&copy;"


class _ParagraphBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.paragraphs: list[dict] = []
        self.dom: list[str] = []
        self.chunks: list[str] = []
        self.link_chars = 0
        self.a_depth = 0
        self.ignore_depth = 0
        self.title_depth = 0
        self.title_chunks: list[str] = []
        self.title: str | None = None
        self.br_pending = False

    # -- paragraph management ------------------------------------------------
    def _start_paragraph(self) -> None:
        self._end_paragraph()

    def _end_paragraph(self) -> None:
        text = SPACE_RE.sub(" ", "".join(self.chunks)).strip()
        if text:
            self.paragraphs.append(
                {
                    "text": text,
                    "word_count": len(text.split()),
                    "linked_char_count": self.link_chars,
                    "dom_path": ".".join(self.dom),
                }
            )
        self.chunks = []
        self.link_chars = 0
        self.br_pending = False

    # -- parser callbacks ----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        if tag in VOID_TAGS:
            if tag == "br":
                if self.br_pending:
                    self._end_paragraph()
                    self.br_pending = False
                else:
                    self.chunks.append(" ")
                    self.br_pending = True
            return
        if tag in IGNORE_CONTENT_TAGS:
            self.ignore_depth += 1
        if tag == "title":
            self.title_depth += 1
        if tag == "a":
            self.a_depth += 1
        if tag in PARAGRAPH_TAGS:
            self._end_paragraph()
        self.dom.append(tag)

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag in VOID_TAGS:
            return
        if tag in IGNORE_CONTENT_TAGS and self.ignore_depth:
            self.ignore_depth -= 1
        if tag == "title" and self.title_depth:
            self.title_depth -= 1
            if self.title is None:
                self.title = "".join(self.title_chunks)
        if tag == "a" and self.a_depth:
            self.a_depth -= 1
        if tag in PARAGRAPH_TAGS:
            self._end_paragraph()
        # pop to the matching open tag if present (tolerates bad nesting)
        if tag in self.dom:
            while self.dom and self.dom[-1] != tag:
                self.dom.pop()
            if self.dom:
                self.dom.pop()

    def handle_data(self, data: str) -> None:
        if self.title_depth:
            self.title_chunks.append(data)
            return
        if self.ignore_depth:
            return
        if data.strip():
            self.br_pending = False
        self.chunks.append(data)
        if self.a_depth:
            self.link_chars += len(data.strip())

    def close(self) -> None:  # flush the trailing paragraph
        super().close()
        self._end_paragraph()


def extract_title(html_text: str) -> str | None:
    """First <title> text, or None (reference process.py:262-265 uses
    html_root.find('.//title').text)."""
    builder = _ParagraphBuilder()
    try:
        builder.feed(html_text)
        builder.close()
    except Exception:
        return builder.title
    return builder.title


def make_paragraphs(html_text: str) -> tuple[list[dict], str | None]:
    """Parse HTML into paragraph dicts; returns (paragraphs, title).

    Reference: justext.preprocess_html_root + justext.make_paragraphs
    (process.py:267-275).
    """
    builder = _ParagraphBuilder()
    builder.feed(html_text)
    builder.close()
    return builder.paragraphs, builder.title


def classify_paragraphs(
    paragraphs: list[dict],
    stoplist: frozenset[str],
    length_low: int,
    length_high: int,
    stopwords_low: float,
    stopwords_high: float,
    max_link_density: float,
) -> None:
    """Context-free classification; sets p['cfclass'] and p['heading'].

    Reference call site process.py:361-370; thresholds util/config.py:317-331.
    """
    for p in paragraphs:
        text = p["text"]
        length = len(text)
        words = text.split()
        word_count = p["word_count"]
        stopword_count = sum(1 for w in words if w.lower() in stoplist)
        stopword_density = stopword_count / word_count if word_count else 0.0
        link_density = p["linked_char_count"] / length if length else 0.0
        p["heading"] = bool(HEADING_RE.search(p["dom_path"]))
        if link_density > max_link_density:
            cls = "bad"
        elif COPYRIGHT_CHAR in text or COPYRIGHT_CODE in text:
            cls = "bad"
        elif SELECT_RE.search(p["dom_path"]):
            cls = "bad"
        elif length < length_low:
            cls = "bad" if p["linked_char_count"] > 0 else "short"
        elif stopword_density >= stopwords_high:
            cls = "good" if length > length_high else "neargood"
        elif stopword_density >= stopwords_low:
            cls = "neargood"
        else:
            cls = "bad"
        p["cfclass"] = cls


def _neighbour(paragraphs: list[dict], i: int, step: int, ignore_neargood: bool) -> str:
    while 0 <= i + step < len(paragraphs):
        i += step
        c = paragraphs[i]["class"]
        if c in ("good", "bad"):
            return c
        if c == "neargood" and not ignore_neargood:
            return c
    return "bad"


def revise_paragraph_classification(
    paragraphs: list[dict], max_good_distance: int, max_heading_distance: int
) -> None:
    """Context-sensitive revision; sets final p['class'] in {good, bad}.

    Reference call site process.py:371-375 (jusText's revise step).
    ``max_good_distance`` is accepted for signature parity; the published
    algorithm uses heading distance in characters and neighbour classes.
    """
    for p in paragraphs:
        p["class"] = p["cfclass"]
    # promote short headings within max_heading_distance chars before good text
    for i, p in enumerate(paragraphs):
        if not (p["heading"] and p["class"] == "short"):
            continue
        distance = 0
        for q in paragraphs[i + 1 :]:
            if q["class"] == "good":
                p["class"] = "neargood"
                break
            distance += len(q["text"])
            if distance > max_heading_distance:
                break
    # absorb short paragraphs into surrounding context
    new_classes: dict[int, str] = {}
    for i, p in enumerate(paragraphs):
        if p["class"] != "short":
            continue
        prev = _neighbour(paragraphs, i, -1, ignore_neargood=True)
        nxt = _neighbour(paragraphs, i, +1, ignore_neargood=True)
        if prev == "good" and nxt == "good":
            new_classes[i] = "good"
        elif prev == "bad" and nxt == "bad":
            new_classes[i] = "bad"
        elif (
            prev == "bad"
            and _neighbour(paragraphs, i, -1, ignore_neargood=False) == "neargood"
        ) or (
            nxt == "bad"
            and _neighbour(paragraphs, i, +1, ignore_neargood=False) == "neargood"
        ):
            new_classes[i] = "good"
        else:
            new_classes[i] = "bad"
    for i, cls in new_classes.items():
        paragraphs[i]["class"] = cls
    # neargood paragraphs keep only if adjacent to good
    for i, p in enumerate(paragraphs):
        if p["class"] != "neargood":
            continue
        prev = _neighbour(paragraphs, i, -1, ignore_neargood=True)
        nxt = _neighbour(paragraphs, i, +1, ignore_neargood=True)
        p["class"] = "bad" if (prev == "bad" and nxt == "bad") else "good"
    # promote bad headings shortly before good paragraphs
    for i, p in enumerate(paragraphs):
        if not (p["heading"] and p["class"] == "bad" and p["cfclass"] != "bad"):
            continue
        distance = 0
        for q in paragraphs[i + 1 :]:
            if q["class"] == "good":
                p["class"] = "good"
                break
            distance += len(q["text"])
            if distance > max_heading_distance:
                break


def html_escape(text: str) -> str:
    """Escape &, <, > (jusText's html_escape used at process.py:382)."""
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
