"""The page-processing pipeline, row-level core.

This is the plain-Python heart of the reference's process.py (U1-U8 in
SURVEY.md §2.8).  It is used two ways:

- row-at-a-time, as the oracle in tests and by the crawl simulator;
- Arrow-batched inside ``operators/extract.py`` (mapInPandas), which is the
  production path — vectorisation here means batching Python calls over
  pyarrow record batches, eliminating per-row serialisation.

Divergence from the reference, by necessity: chared (byte-trigram charset
detection) is not available in this environment, so the decode ladder is
meta-charset regexes → meta encoding → strict utf-8 (reference
process.py:180-214 with the chared branch skipped; the import is gated so
installing chared restores the full ladder).  lxml+justext are replaced by
``boilerplate.py`` (same algorithm, stdlib parser).
"""

from __future__ import annotations

import codecs
import hashlib
import re
from functools import lru_cache
from importlib import resources

from .. import config
from . import boilerplate, charset, convert, urlkit
from .trigram import TrigramModel, lang_difference, model_class

try:  # pragma: no cover - not installed in this environment
    from chared.detector import EncodingDetector  # type: ignore

    _HAVE_CHARED = True
except ImportError:
    _HAVE_CHARED = False

# ---------------------------------------------------------------------------
# language models (built once per process; executors cache via module import)
# ---------------------------------------------------------------------------


def _read_data(subdir: str, name: str) -> str:
    return (
        resources.files("macocu_crawler_spark")
        .joinpath("data", subdir, name)
        .read_text(encoding="utf-8")
    )


@lru_cache(maxsize=None)
def get_lang_models() -> dict[str, TrigramModel]:
    """Trigram model per configured language (reference process.py:99-107)."""
    cls = model_class()  # trigram, or unigram for CJK (config.UNIGRAM_MODELS)
    models = {}
    for lang in config.LANGUAGES:
        models[lang] = cls()
        models[lang].add_lines([_read_data("lang_samples", lang)])
    return models


@lru_cache(maxsize=None)
def get_stoplists() -> dict[str, frozenset[str]]:
    """Stopword set per language (reference process.py:111-121)."""
    lists = {}
    for lang in config.LANGUAGES:
        lines = _read_data("stopwords", lang).splitlines()
        lists[lang] = frozenset(l.strip() for l in lines if l.strip() and l[0] != "#")
    return lists


# ---------------------------------------------------------------------------
# charset detection / decoding (reference process.py:170-225)
# ---------------------------------------------------------------------------

META_ENC_RES = [
    re.compile(
        rb"""<meta\s+http-equiv=['"]?content-type['"]?\s+content=['"]?[^'"]*charset=([^'" >/]+)""",
        re.I,
    ),
    re.compile(
        rb"""<meta\s+content=['"]?[^'"]*charset=([^'" >/]+)['"]?\s+http-equiv=['"]?content-type['"]?""",
        re.I,
    ),
    re.compile(rb"""<meta\s+http-equiv=['"]?charset['"]?\s+content=['"]?([^'" >/]+)""", re.I),
    re.compile(rb"""<meta\s+content=['"]?([^'" >/]+)['"]?\s+http-equiv=['"]?charset['"]?""", re.I),
    re.compile(rb"""<meta\s+charset=['"]?([^'" >/]+)""", re.I),
]


def html_decode(html_bs: bytes, lang: str) -> tuple[str, str | None, str | None]:
    """Decode HTML bytes → (text, meta_encoding, chared_encoding).

    Reference process.py:180-214; raises UnicodeError when nothing works.
    """
    meta_encoding = None
    for meta_re in META_ENC_RES:
        m = meta_re.search(html_bs)
        if m:
            try:
                meta_encoding = codecs.lookup(m.group(1).decode("utf-8")).name
            except (UnicodeDecodeError, LookupError, TypeError):
                pass
            else:
                break
    chared_encoding = None
    if _HAVE_CHARED:  # pragma: no cover
        candidates = _chared_model(lang).classify(html_bs)
    elif config.CHARSET_DETECTOR:
        # chared-equivalent byte-trigram detector (functions/charset.py) —
        # same precedence: detector beats a LYING <meta> charset.
        # Fast path: bytes that strict-decode as utf-8 classify as utf-8
        # anyway (pure ASCII has no evidence → utf-8 default; valid utf-8
        # multibyte sequences are exactly what the utf-8 model matches), so
        # skip the trigram scoring — C-level decode instead of Python work
        # on the hot path; legacy pages fail strict decode and fall through
        # to the detector unchanged.
        try:
            return html_bs.decode("utf-8"), meta_encoding, "utf-8"
        except UnicodeError:
            candidates = charset.detect_encodings(html_bs)
    else:
        candidates = []
    if candidates:
        try:
            chared_encoding = codecs.lookup(candidates[0]).name
        except LookupError:
            pass
        else:
            try:
                return html_bs.decode(chared_encoding), meta_encoding, chared_encoding
            except UnicodeError:
                pass
    if meta_encoding and meta_encoding != "utf-8":
        try:
            return html_bs.decode(meta_encoding), meta_encoding, chared_encoding
        except UnicodeError:
            pass
    return html_bs.decode("utf-8"), meta_encoding, chared_encoding


if _HAVE_CHARED:  # pragma: no cover

    @lru_cache(maxsize=None)
    def _chared_model(lang: str):
        return EncodingDetector.load(f"util/chared_models/{lang}")


def txt_decode(text_bs: bytes) -> tuple[str, None, str | None]:
    """Reference process.py:216-225: chared candidates in rank order, then
    strict utf-8 (raises UnicodeError when nothing works)."""
    if config.CHARSET_DETECTOR and not _HAVE_CHARED:
        try:  # fast path (see html_decode): valid utf-8 classifies utf-8
            return text_bs.decode("utf-8"), None, "utf-8"
        except UnicodeError:
            pass
        for cand in charset.detect_encodings(text_bs):
            try:
                enc = codecs.lookup(cand).name
                return text_bs.decode(enc), None, enc
            except (LookupError, UnicodeError):
                continue
    return text_bs.decode("utf-8"), None, None


# ---------------------------------------------------------------------------
# paragraph extraction + language identification (process.py:227-396)
# ---------------------------------------------------------------------------

XML_HEADER_RE = re.compile(r"^\s*<\?xml.*")
TOKEN_SEPARATOR_RE = re.compile(r"\s+", re.UNICODE)


def content_hash(text: str) -> int:
    """Deterministic signed 64-bit content hash.

    Replaces the reference's salted builtin ``hash()`` (process.py:637,641 —
    SURVEY.md §1.2 caveat): the rebuild needs hashes stable across processes,
    executors and runs, so dedup *decisions* are reproducible.  blake2b/8B is
    used because the same function must run in Python (simulator, UDFs);
    values are interpreted as signed int64 to fit LongType columns.
    """
    digest = hashlib.blake2b(text.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(digest, "big", signed=True)

DOC_LEN_RANGES = (
    (1000000, "1M+"), (100000, "100k-1M"), (10000, "10k-100k"), (5000, "5k-10k"),
    (1000, "1k-5k"), (500, "500-1k"), (100, "100-500"), (0, "0-100"),
)  # process.py:136-137


def format_doc_len(doc_len: int) -> str:
    for threshold, label in DOC_LEN_RANGES:
        if doc_len >= threshold:
            return label
    return "0-100"


def format_date(timestamp_s: str) -> str:
    """YYYYMMDDHHMMSS → 'YYYY-MM-DD HH:MM' (process.py:129-134)."""
    if len(timestamp_s) == 14:
        return (
            f"{timestamp_s[0:4]}-{timestamp_s[4:6]}-{timestamp_s[6:8]}"
            f" {timestamp_s[8:10]}:{timestamp_s[10:12]}"
        )
    return timestamp_s


def extract_paragraphs(
    data_bs: bytes, file_type: str, lang: str,
    conversion_enabled: bool | None = None,
) -> tuple[list[dict], str, str | None, str | None, str | None] | None:
    """Decode + paragraph-split one document for one candidate language.

    Returns (paragraphs, html_text, title, meta_encoding, chared_encoding)
    or None on failure.  Reference process.py:228-332 (html + txt branches;
    binary conversion is CONVERSION_ENABLED=False in the reference default
    and out of scope here, process.py:58-64).
    """
    if file_type == "html":
        try:
            html_text, meta_enc, chared_enc = html_decode(data_bs, lang)
        except (UnicodeError, ValueError):
            return None
        html_text = html_text.strip()
        if not html_text:
            return None
        for mt_string in config.MT_STRINGS:  # process.py:248-252
            if mt_string in html_text:
                return None
        html_text = XML_HEADER_RE.sub("", html_text, count=1)
        try:
            paragraphs, title = boilerplate.make_paragraphs(html_text)
        except Exception:
            return None
        if title:
            title = urlkit.clean_xml_val(title)[:300].strip()  # process.py:262-265
        else:
            title = ""
        return paragraphs, html_text, title, meta_enc, chared_enc
    if file_type == "txt":
        return _txt_paragraphs(data_bs)
    if conversion_enabled is None:
        # standalone calls: this process's config; Spark plans thread the
        # DRIVER's flag through the UDF closure instead (operators/extract)
        conversion_enabled = config.CONVERSION_ENABLED
    if conversion_enabled and file_type in convert.CONVERTERS:
        # U3 slice (process.py:300-329): in-process docx/odt zip+XML
        # extraction → the same txt_decode path an external converter feeds
        txt_bs = convert.convert_to_txt(file_type, data_bs)
        if not txt_bs:
            return None
        return _txt_paragraphs(txt_bs)
    return None  # binary file and conversion disabled (process.py:331)


def _txt_paragraphs(text_bs: bytes):
    try:
        txt_data, meta_enc, chared_enc = txt_decode(text_bs)
    except (UnicodeError, ValueError):
        return None
    paragraphs = [
        {
            "text": par_text.strip(),
            "word_count": len(par_text.split()) if config.SPACE_SEP_TOKENS else 0,
            "linked_char_count": 0,
            "dom_path": "p",
        }
        for par_text in txt_data.split("\n\n")
    ]
    return paragraphs, "", "", meta_enc, chared_enc


def any2txt(data_bs: bytes, file_type: str, error_msgs: list[str],
            conversion_enabled: bool | None = None,
            _diff_cache: dict | None = None):
    """Extract text; pick the best language by trigram difference.

    Reference process.py:335-396.  The reference re-runs extract_paragraphs
    per candidate language because chared decoding is language-dependent;
    without chared the extraction is language-independent, so we extract once
    and score each language on the same text — identical results under the
    default config, one HTML parse instead of |LANGUAGES|.

    Returns (plaintext, prevertical, paragraphs, html_text, title, lang,
    lang_diff, meta_enc, chared_enc) or None.
    """
    lang_models = get_lang_models()
    first_lang = next(iter(config.LANGUAGES))
    paragraph_data = extract_paragraphs(
        data_bs, file_type, first_lang, conversion_enabled=conversion_enabled
    )
    if not (paragraph_data and paragraph_data[0]):
        error_msgs.append("cannot extract text")
        return None
    paragraphs, html_text, title, meta_enc, chared_enc = paragraph_data
    doc_text = "\n".join(p["text"] for p in paragraphs).strip()
    if not doc_text:
        error_msgs.append("cannot extract text")
        return None
    min_doc_lang_diff, doc_lang = 1.0, None
    doc_model = model_class()(doc_text)
    for lang in config.LANGUAGES:  # deterministic order (config.py)
        doc_lang_diff = lang_models[lang].diff(doc_model)
        if doc_lang_diff < min_doc_lang_diff:
            doc_lang = lang
            min_doc_lang_diff = doc_lang_diff
    if doc_lang is None:
        error_msgs.append("different from all recognised languages")
        return None
    boilerplate.classify_paragraphs(
        paragraphs,
        stoplist=get_stoplists()[doc_lang],
        length_low=config.JUSTEXT_LENGTH_LOW,
        length_high=config.JUSTEXT_LENGTH_HIGH,
        stopwords_low=config.JUSTEXT_STOPWORDS_LOW,
        stopwords_high=config.JUSTEXT_STOPWORDS_HIGH,
        max_link_density=config.JUSTEXT_MAX_LINK_DENSITY,
    )
    boilerplate.revise_paragraph_classification(
        paragraphs,
        max_good_distance=config.JUSTEXT_MAX_GOOD_DISTANCE,
        max_heading_distance=config.JUSTEXT_MAX_HEADING_DISTANCE,
    )
    # prevert rendering, process.py:376-394
    plaintext, prevertical = [], []
    for p in paragraphs:
        if p["text"] and (
            config.KEEP_BAD_PARAGRAPHS
            or p["class"] == "good"
            or (config.ALLOW_NEARGOOD_PARAGRAPHS and p["cfclass"] == "neargood")
        ):
            p_text = boilerplate.html_escape(p["text"])
            # per-task memo (extract.py threads one dict per Spark task):
            # lang_difference is pure in (model, text) and web boilerplate
            # repeats the same paragraph across pages (~65% duplicate
            # occurrences on the bench web), so the trigram-vector build +
            # cosine reruns only for unseen (lang, text) pairs.  Bounded
            # by the caller; plain calls (cache=None) are unchanged.
            if _diff_cache is None:
                par_diff = lang_difference(lang_models[doc_lang], p_text)
            else:
                _ck = (doc_lang, p_text)
                par_diff = _diff_cache.get(_ck)
                if par_diff is None:
                    par_diff = lang_difference(lang_models[doc_lang], p_text)
                    if len(_diff_cache) < 200_000:
                        _diff_cache[_ck] = par_diff
            if par_diff <= config.LANG_DIFF_THRESHOLD_PAR:
                if p["class"] == "good" or (
                    config.ALLOW_NEARGOOD_PARAGRAPHS and p["cfclass"] == "neargood"
                ):
                    plaintext.append(p_text)
                heading = ' heading="yes"' if p["heading"] else ""
                prevertical.append(
                    '<p%s class="%s" cfclass="%s" langdiff="%.2f">\n%s\n</p>'
                    % (heading, p["class"], p["cfclass"], par_diff, p_text)
                )
    if not plaintext:
        error_msgs.append("no good plaintext")
        return None
    return (
        "\n".join(plaintext),
        "\n".join(prevertical),
        paragraphs,
        html_text,
        title,
        doc_lang,
        min_doc_lang_diff,
        meta_enc,
        chared_enc,
    )


# ---------------------------------------------------------------------------
# link extraction (process.py:398-432)
# ---------------------------------------------------------------------------

HTML_BASE_TAG_RE = re.compile(r'<base [^>]*href="([^"]+)/?"', re.UNICODE)
A_HREF_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))[^>]*>""",
    re.I | re.S,
)
NOFOLLOW_RE = re.compile(r"""rel\s*=\s*['"]?nofollow['"]?""", re.I)
# lxml (the reference's parser, process.py:409) never surfaces markup that
# sits inside script/style CONTENT or comments as elements — the href regex
# must not either (caught by tests/test_adversarial_html.py).  Scripts are
# stripped before comments so legacy <script><!-- ... //--></script> hiding
# doesn't unbalance the comment strip.
SCRIPT_STYLE_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.I | re.S)
# an UNCLOSED <script>/<style> swallows the rest of the document under lxml
# (CDATA mode to EOF) — after paired spans are stripped, any opening tag left
# has no close, so drop from it to EOF to match (COVERAGE.md U4 divergence
# (a), closed in round 3; the paragraph path already behaves this way via
# html.parser's CDATA mode)
UNCLOSED_SCRIPT_STYLE_RE = re.compile(r"<(?:script|style)\b.*\Z", re.I | re.S)
HTML_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)


def iter_hrefs(html_text: str):
    """All <a href> values except rel=nofollow (reference xpath at
    process.py:409: .//a[not(@rel='nofollow')]/@href)."""
    # paired script/style spans first (script bodies may contain "<!--"),
    # then comments (which may contain unclosed "<script>"), then any
    # remaining opening script/style tag is unclosed → swallow to EOF
    html_text = UNCLOSED_SCRIPT_STYLE_RE.sub(
        "", HTML_COMMENT_RE.sub("", SCRIPT_STYLE_RE.sub("", html_text))
    )
    for m in A_HREF_RE.finditer(html_text):
        if NOFOLLOW_RE.search(m.group(0)):
            continue
        yield m.group(1) if m.group(1) is not None else (m.group(2) or m.group(3))


def extract_links_from_html(
    html_text: str, src_url: str, src_host: str, empty_page: bool
) -> tuple[set, set, set]:
    """→ (result_links:set[(scheme,host,path)], binfile_links:set[url],
    ignored_links:set[(reason,url)]).  Reference process.py:400-432."""
    result_links: set = set()
    ignored_links: set = set()
    binfile_links: set = set()
    if not html_text:
        return result_links, binfile_links, ignored_links
    m = HTML_BASE_TAG_RE.search(html_text)
    base_url = f"{m.group(1)}/" if m else src_url
    doc_links = set()
    for a_href in iter_hrefs(html_text):
        new_url = "".join(urlkit.url_strip(part) for part in a_href.split("\n"))
        if new_url:
            try:
                doc_links.add(urlkit.url_join_rel_norm(base_url, new_url))
            except ValueError:
                continue
    for url in doc_links:
        url_parts, bad_reason = urlkit.url_split_and_check_parts(url, src_host, empty_page)
        if url_parts:
            result_links.add(url_parts)
        elif bad_reason == "path-binary-file":
            binfile_links.add(url)
        else:
            ignored_links.add((bad_reason, url))
    return result_links, binfile_links, ignored_links


# ---------------------------------------------------------------------------
# whole-page processing (one row of the pages table → one EXTRACTED row)
# ---------------------------------------------------------------------------


def process_page(
    wpage_id: int,
    url: str,
    html_bs: bytes | None,
    http_header: bytes | None,
    connect_time: str,
    ip: str | None = None,
    conversion_enabled: bool | None = None,
    _diff_cache: dict | None = None,
) -> dict:
    """Full reference pipeline for one page (process.py:588-650).

    ``connect_time`` is the reference's YYYYMMDDHHMMSS stamp (crawl.py:577),
    derived from warc_ts upstream.  Returns a dict in schemas.EXTRACTED
    column order.
    """
    scheme, host, path = urlkit.url_split(url)
    file_type = urlkit.extract_file_type(http_header) if http_header else "html"
    last_modified = urlkit.extract_last_modified(http_header) if http_header else None
    html_bs = html_bs or b""
    error_msgs: list[str] = []
    txt = prevert = title = ""
    lang = ""
    lang_diff = 1.0
    meta_enc = chared_enc = None
    html_text = ""
    extracted = any2txt(
        html_bs, file_type, error_msgs, conversion_enabled=conversion_enabled,
        _diff_cache=_diff_cache,
    )
    if extracted is not None:
        lang, lang_diff = extracted[5], extracted[6]
        if lang in config.LANGUAGES_ACCEPT:
            txt, prevert, _pars, html_text, title, lang, lang_diff, meta_enc, chared_enc = extracted
        else:
            # process.py:607-618: on unaccepted language html_root/html stay
            # None/'' — NO links are extracted from such pages (the empty-page
            # branch of check_url_host is unreachable in the current reference;
            # kept + unit-tested for parity).
            error_msgs.append("unaccepted language: %s (%.2f)" % (lang, lang_diff))
            txt = ""
    txt_len = len(txt)
    links, binfile_links, ignored_links = extract_links_from_html(
        html_text, url, host, empty_page=not txt_len
    )
    url_display = urlkit.clean_url_display(scheme, host, path)
    if txt_len:
        token_count = len([t for t in TOKEN_SEPARATOR_RE.split(txt) if t])
        doc = (
            '<doc id="%s" title="%s" length="%s" crawl_date="%s"%s lang="%s"'
            ' lang_diff="%.2f" ip="%s" url="%s" file_type="%s" enc_meta="%s"'
            ' enc_chared="%s">\n%s\n</doc>\n'
            % (
                wpage_id,
                title,
                format_doc_len(txt_len),
                format_date(connect_time),
                ' modified_date="%s"' % last_modified if last_modified else "",
                lang,
                lang_diff,
                ip,
                url_display,
                file_type if file_type else "",
                meta_enc,
                chared_enc,
                prevert,
            )
        )
    else:
        token_count = 0
        doc = ""
        prevert = ""
        title = ""
    return {
        "wpage_id": wpage_id,
        "url": url,
        "url_display": url_display,
        "title": title,
        "text": txt,
        "prevert": doc,
        "lang": lang,
        "lang_diff": float(lang_diff),
        "crawl_date": format_date(connect_time),
        "modified_date": last_modified,
        "file_type": file_type,
        "enc_meta": meta_enc,
        "enc_chared": chared_enc,
        "token_count": token_count,
        "txt_len": txt_len,
        # reference docmeta raw_len = len(decoded html_text), which is ''
        # for rejected pages (process.py:608, 641) — this is what feeds the
        # domain counters and thus the yield rule
        "raw_len": len(html_text),
        "scheme": scheme,
        "host": host,
        "path": path,
        "html_hash": content_hash(html_text) if html_text else 0,
        "txt_hash": content_hash(txt) if txt_len else 0,
        "links": sorted(links),
        "binfile_links": sorted(binfile_links),
        "ignored_links": sorted(ignored_links),
        "error_msgs": error_msgs,
    }
