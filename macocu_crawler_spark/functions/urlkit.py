"""URL kernel: parsing, normalisation, admission checks.

Mirrors the semantics of reference util/http.py:99-234 and
util/domain.py:31-33 (citations inline).  Each operation exists twice:

- a plain-Python function (used by the crawl simulator, by tests, and inside
  the vectorized pandas UDFs), and
- a Spark builder returning Column expressions where the semantics are
  expressible with JVM-side built-ins (the fast path: rlike/regexp_replace
  stay inside whole-stage codegen, no Python round-trip).

The one genuinely fiddly op — relative-URL resolution (http.py:118-139) —
is a pandas UDF: its byte-level quirks (posixpath.normpath, single trailing
slash, trailing host dot) feed the URL-seen set, so fidelity beats speed.
"""

from __future__ import annotations

import posixpath
import re
import urllib.parse
from functools import lru_cache
from os.path import dirname

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import config

# ---------------------------------------------------------------------------
# plain-Python kernel
# ---------------------------------------------------------------------------

URL_RE = re.compile(r"https?://.+\..+", re.I)  # http.py:41
SPACE_RE = re.compile(r"\s+")                  # util/__init__.py space_re
BAD_FILE_EXTENSIONS = (
    "7z|ai|aiff|apk|asf|avi|bin|bmp|bz2|c|com|css|deb|djvu|dvi|eot|eps|exe|f4v"
    "|flv|gif|gz|h|h263|h264|h265|ico|iso|jar|jpg|jpeg|js|m4v|mid|mkv|mng|mov"
    "|mp2|mp3|mp4|mpeg|mpg|msi|ods|ogg|ogv|pas|phar|png|ppt|pptx|psd|qt|ra|ram"
    "|rm|rpm|rtf|sdd|sdw|sh|sit|svg|swf|sxc|sxi|sxw|tar|tex|tgz|tif|tiff|ttf"
    "|wav|webm|wma|wmf|wmv|woff|xcf|xls|xlsx|xml|xz|zip"
)  # http.py:52-55
BAD_FILE_EXTENSIONS_RE = re.compile(r"\.(?:%s)$" % BAD_FILE_EXTENSIONS, re.I)
BIN_FILE_EXTENSIONS_RE = re.compile(r"\.(?:doc|docx|odt|pdf|ps)$", re.I)  # http.py:57
TLD_BLACKLIST_RE = re.compile(config.TLD_BLACKLIST) if config.TLD_BLACKLIST else None
TLD_WHITELIST_RE = re.compile(config.TLD_WHITELIST) if config.TLD_WHITELIST else None
TLD_NATIVE_RE = re.compile(config.TLD_NATIVE) if config.TLD_NATIVE else None

# session-id / tracking boilerplate stripped from paths before URL-seen
# hashing (domain.py:31-33, verbatim semantics)
PATH_BOILERPLATE = (
    r"[&;#/?](?:(?:(?:(?:j|php)s(?:ess|ession)?|auth)_?(?:id)?"
    r"|(?:s(?:ess|ession)?|auth)_?id)|utm_source)=.*"
)
PATH_BOILERPLATE_RE = re.compile(PATH_BOILERPLATE, re.IGNORECASE)

ROBOT_PATH = "/robots.txt"  # http.py:32


def url_strip(url: str) -> str:
    """http.py:99-100: treat %20 as space, strip, re-encode spaces."""
    return url.replace("%20", " ").strip().replace(" ", "%20")


def url_split(url: str) -> tuple[str, str, str]:
    """http.py:102-109: url -> (scheme, netloc, path[?query])."""
    parts = urllib.parse.urlsplit(url)
    path, query = url_strip(parts.path), url_strip(parts.query)
    full_path = f"{path}?{query}" if query else (path or "/")
    return parts.scheme, url_strip(parts.netloc), full_path


def url_join(scheme: str, host: str, full_path: str) -> str:
    """http.py:111-116."""
    if not full_path:
        full_path = "/"
    elif not full_path.startswith("/"):
        full_path = "/" + full_path
    return f"{scheme}://{host}{full_path}"


def url_join_rel_norm(src_url: str, target_url: str) -> str:
    """Resolve target against source, normalise. http.py:118-139.

    Byte-level contract: spaces removed (not encoded), fragments dropped,
    posixpath.normpath applied, a single trailing slash preserved, trailing
    dot on the netloc stripped.
    """
    src = urllib.parse.urlsplit(src_url.replace(" ", ""), allow_fragments=False)
    tgt = urllib.parse.urlsplit(target_url.replace(" ", ""), allow_fragments=False)
    scheme = tgt.scheme or src.scheme
    netloc = tgt.netloc or src.netloc
    if tgt.path:
        if not tgt.scheme and not tgt.netloc and not tgt.path.startswith("/"):
            base_dir = dirname(src.path).rstrip("/")
            path = f"{base_dir}/{tgt.path.lstrip('/')}"
        else:
            path = tgt.path
        path = posixpath.normpath(path)
        if tgt.path.endswith("/") and not path.endswith("/"):
            path += "/"
    else:
        path = "/"
    if netloc.endswith("."):
        netloc = netloc[:-1]
    return urllib.parse.urlunsplit((scheme, netloc, path, tgt.query, ""))


def clean_xml_val(value: str) -> str:
    """XML-escape + whitespace collapse + backslash strip.
    util/__init__.py:302-306 — replicated literally: the reference strips
    first, does NOT escape '&', escapes ' as &apos; (html.escape would use
    &#x27; and add &amp;), collapses whitespace after escaping, and drops
    backslashes last.  Byte contract (prevert attrs) — do not 'fix'."""
    escaped = (
        value.strip()
        .replace('"', "&quot;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace("'", "&apos;")
    )
    return SPACE_RE.sub(" ", escaped).replace("\\", "")


BLOGSPOT_TLD_RE = re.compile(r"blogspot\.../")


def clean_url_display(scheme: str, host: str, path: str) -> str:
    """Prevert url= attribute cleaning. http.py:141-152."""
    if config.DECODE_IDNA_HOSTNAMES and (host.startswith("xn--") or ".xn--" in host):
        try:
            host = host.encode("utf-8").decode("idna")
        except UnicodeError:
            pass
    url = url_join(scheme.lower(), host.lower(), path)
    url = (
        clean_xml_val(SPACE_RE.sub("", url))
        .replace("[", "%5B")
        .replace("]", "%5D")
        .replace("\\", "%5C")
    )
    url = BLOGSPOT_TLD_RE.sub("blogspot.com/", url)
    return url[: config.MAX_PATH_LEN]


def sanitise_path(path: str) -> str:
    """Strip session-id/utm boilerplate before URL-seen hashing.
    domain.py:142-144."""
    return PATH_BOILERPLATE_RE.sub("", path)


def check_url_host(host: str, src_host: str | None = None, empty_page: bool = False) -> str | None:
    """Host admission; returns a rejection reason or None. http.py:154-193.

    Reason strings must match the reference exactly (they are written to the
    ignored_urls table and compared in tests).
    """
    if len(host) > config.MAX_HOSTNAME_LEN:
        return "too-long"
    split_ok = True
    if host[:8] == "www.www.":
        split_ok = False
    else:
        parts = host.split(".")
        if len(set(parts)) + 3 < len(parts):
            split_ok = False
    if not split_ok:
        return "repetitive"
    if not host:
        return "empty-domain"
    if TLD_BLACKLIST_RE is not None and TLD_BLACKLIST_RE.search(host):
        if _has_domain_whitelist():
            if not _white_domain(host):
                return "blacklisted-TLD+not-white-domain"
        else:
            return "blacklisted-TLD"
    if _black_domain(host):
        return "blacklisted-domain"
    if TLD_WHITELIST_RE is not None and not TLD_WHITELIST_RE.search(host):
        if _has_domain_whitelist():
            if not _white_domain(host):
                return "unaccepted-TLD+not-white-domain"
        else:
            return "unaccepted-TLD"
    if empty_page:
        if host == src_host:
            if not config.EXTRACT_EMPTY_PAGE_INTERNAL_LINKS:
                return "empty-page"
        elif not config.EXTRACT_EMPTY_PAGE_EXTERNAL_LINKS or (
            (TLD_NATIVE_RE is None or not TLD_NATIVE_RE.search(host))
            and not (_has_domain_whitelist() and _white_domain(host))
        ):
            return "empty-page"
    return None


def _in_domain_list(host: str, domains: frozenset[str]) -> bool:
    """Suffix-at-label-boundary match (http.py:59-69 compiles the list into
    '(?:^|\\.)(?:...)$')."""
    return any(host == d or host.endswith("." + d) for d in domains)


def get_domain_list_re(domain_list_path: str | None):
    """Compile a domain-list FILE into the reference's matching regex
    (http.py:59-69): one entry per line, '#' comments stripped, entries are
    regex fragments, matched as '(?:^|\\.)(?:e1|e2|...)$' case-insensitive."""
    if not domain_list_path:
        return None
    comment_re = re.compile("#.*")
    entries = set()
    with open(domain_list_path, encoding="utf-8", newline="\n") as f:
        for line in f.read().split("\n"):
            line = comment_re.sub("", line).strip()
            if line:
                entries.add(line)
    if not entries:
        return None
    return re.compile(
        "(?:^|\\.)(?:%s)$" % "|".join(entries), re.UNICODE | re.IGNORECASE
    )


@lru_cache(maxsize=1)
def _domain_list_files():
    """Lazily-compiled file lists (config *_PATH knobs, config.py:183-204 of
    the reference).  Lazy so executor-side UDF workers compile from the
    shipped config on first use; tests clear the cache after repointing the
    config paths."""
    black_re = get_domain_list_re(config.DOMAIN_BLACKLIST_PATH)
    white_re = get_domain_list_re(config.DOMAIN_WHITELIST_PATH)
    exact: frozenset[str] = frozenset()
    if config.DOMAIN_BLACKLIST_EXACT_PATH:
        with open(config.DOMAIN_BLACKLIST_EXACT_PATH, encoding="utf-8",
                  newline="\n") as f:
            exact = frozenset(f.read().rstrip().split("\n"))
    return black_re, white_re, exact


def _has_domain_whitelist() -> bool:
    return bool(config.DOMAIN_WHITELIST) or _domain_list_files()[1] is not None


def _white_domain(host: str) -> bool:
    white_re = _domain_list_files()[1]
    return (white_re is not None and white_re.search(host) is not None) or (
        bool(config.DOMAIN_WHITELIST) and _in_domain_list(host, config.DOMAIN_WHITELIST)
    )


def _black_domain(host: str) -> bool:
    black_re, _white, exact = _domain_list_files()
    if host in exact or (config.DOMAIN_BLACKLIST_EXACT and host in config.DOMAIN_BLACKLIST_EXACT):
        return True
    if black_re is not None and black_re.search(host):
        return True
    return bool(config.DOMAIN_BLACKLIST) and _in_domain_list(host, config.DOMAIN_BLACKLIST)


def check_url_path(path: str) -> str | None:
    """Path admission; returns a rejection reason or None. http.py:195-212."""
    if len(path) > config.MAX_PATH_LEN or path.count("/") > 30 or path.count(".") > 30:
        return "too-long"
    for split_char in "/&.":
        parts = path.split(split_char)
        if len(set(parts)) + 4 < len(parts):
            return "repetitive"
    if BAD_FILE_EXTENSIONS_RE.search(path):
        return "bad-file-type"
    if not config.CONVERSION_ENABLED and BIN_FILE_EXTENSIONS_RE.search(path):
        return "binary-file"
    return None


def url_split_and_check_parts(
    url: str, src_host: str | None = None, empty_page: bool = False
) -> tuple[tuple[str, str, str] | None, str | None]:
    """Full URL admission pipeline. http.py:214-234."""
    url = SPACE_RE.sub("", url)
    if not URL_RE.match(url) or len(url) < 12:
        return None, "url-invalid-or-short"
    try:
        scheme, host, path = url_split(url)
    except ValueError:
        return None, "url-unparseable"
    if scheme not in ("http", "https"):
        return None, "scheme-unsupported"
    bad_host = check_url_host(host, src_host, empty_page)
    if bad_host:
        return None, f"host-{bad_host}"
    bad_path = check_url_path(path)
    if bad_path:
        return None, f"path-{bad_path}"
    return (scheme, host, path), None


# -- HTTP header scalar extracts (http.py:236-252) --

CONTENT_TYPES = {
    "text/html": "html",
    "text/plain": "txt",
    "application/msword": "doc",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document": "docx",
    "application/vnd.oasis.opendocument.text": "odt",
    "application/pdf": "pdf",
    "application/postscript": "ps",
}  # http.py:43-51
CONTENT_TYPE_RE = re.compile(rb"Content-Type:\s*([^;\s]+)", re.I)
LAST_MODIFIED_RE = re.compile(
    r"Last-Modified:.*(\d\d) (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) (20\d\d)",
    re.I,
)
MONTHS = {
    "Jan": "01", "Feb": "02", "Mar": "03", "Apr": "04", "May": "05", "Jun": "06",
    "Jul": "07", "Aug": "08", "Sep": "09", "Oct": "10", "Nov": "11", "Dec": "12",
}


def extract_file_type(http_header: bytes | None) -> str | None:
    """http.py:237-241."""
    if not http_header:
        return None
    m = CONTENT_TYPE_RE.search(http_header)
    if not m:
        return None
    try:
        return CONTENT_TYPES.get(m.group(1).decode("utf-8"))
    except UnicodeDecodeError:
        return None


def extract_last_modified(http_header: bytes | None) -> str | None:
    """http.py:247-252."""
    if not http_header:
        return None
    try:
        m = LAST_MODIFIED_RE.search(http_header.decode("utf-8"))
    except UnicodeDecodeError:
        return None
    if not m:
        return None
    day, mon, year = m.groups()
    return f"{year}-{MONTHS[mon.capitalize()]}-{day}"


# ---------------------------------------------------------------------------
# Spark builders (JVM-side column expressions — no Python round trip)
# ---------------------------------------------------------------------------


def sanitise_path_col(path: Column) -> Column:
    """sanitise_path as a codegen'd expression (java.util.regex flavor of the
    same pattern; verified equivalent in tests)."""
    return F.regexp_replace(path, "(?i)" + PATH_BOILERPLATE, "")


def url_parts_cols(url: Column) -> list[Column]:
    """Split a URL column into scheme/host/path columns with parse_url.
    Fast path for well-formed URLs (fixtures); the pandas-UDF kernel is used
    where reference byte-fidelity matters."""
    path = F.parse_url(url, F.lit("PATH"))
    query = F.parse_url(url, F.lit("QUERY"))
    full_path = F.when(
        query.isNotNull() & (query != ""), F.concat(path, F.lit("?"), query)
    ).otherwise(F.when((path.isNull()) | (path == ""), F.lit("/")).otherwise(path))
    return [
        F.lower(F.regexp_extract(url, r"^(https?)://", 1)).alias("scheme"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        full_path.alias("path"),
    ]


def check_url_reason_col(scheme: Column, host: Column, path: Column) -> Column:
    """The F1-F4 admission cascade as one CASE expression producing the
    reference reason string (NULL = accepted).  Covers the default-config
    branches (TLD blacklist '\\.tk$', no white/blacklists, conversion off) —
    the full branchy version incl. empty-page policy runs in the link UDF."""
    host_parts = F.split(host, r"\.")
    path_slash = F.size(F.split(path, "/")) - 1
    path_dot = F.size(F.split(path, r"\.")) - 1
    return (
        F.when(
            ~F.concat(scheme, F.lit("://"), host, path).rlike(r"(?i)^https?://.+\..+")
            | (F.length(F.concat(scheme, F.lit("://"), host, path)) < 12),
            F.lit("url-invalid-or-short"),
        )
        .when(~scheme.isin("http", "https"), F.lit("scheme-unsupported"))
        .when(F.length(host) > config.MAX_HOSTNAME_LEN, F.lit("host-too-long"))
        .when(
            host.startswith("www.www.")
            | (F.size(F.array_distinct(host_parts)) + 3 < F.size(host_parts)),
            F.lit("host-repetitive"),
        )
        .when((host.isNull()) | (host == ""), F.lit("host-empty-domain"))
        .when(host.rlike(config.TLD_BLACKLIST), F.lit("host-blacklisted-TLD"))
        .when(
            (F.length(path) > config.MAX_PATH_LEN)
            | (path_slash > 30)
            | (path_dot > 30),
            F.lit("path-too-long"),
        )
        .when(
            (F.size(F.array_distinct(F.split(path, "/"))) + 4 < F.size(F.split(path, "/")))
            | (F.size(F.array_distinct(F.split(path, "&"))) + 4 < F.size(F.split(path, "&")))
            | (F.size(F.array_distinct(F.split(path, r"\."))) + 4 < F.size(F.split(path, r"\."))),
            F.lit("path-repetitive"),
        )
        .when(path.rlike(r"(?i)\.(?:%s)$" % BAD_FILE_EXTENSIONS), F.lit("path-bad-file-type"))
        .when(
            # with conversion enabled, binary-doc paths are fetched and
            # converted instead of routed to the binfile sink (http.py:211)
            path.rlike(r"(?i)\.(?:doc|docx|odt|pdf|ps)$")
            & F.lit(not config.CONVERSION_ENABLED),
            F.lit("path-binary-file"),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def url_join_rel_norm_udf():
    """Arrow-batched pandas UDF over (base_url, href) series — P3."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _udf(base: pd.Series, href: pd.Series) -> pd.Series:
        out = []
        for b, h in zip(base, href):
            try:
                out.append(url_join_rel_norm(b, h))
            except ValueError:
                out.append(None)
        return pd.Series(out, dtype="object")

    return _udf
