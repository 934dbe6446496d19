"""URL kernel unit tests (SURVEY.md §5.1) — semantics from reference
util/http.py:99-234 and util/domain.py:31-33."""

import pytest

from macocu_crawler_spark.functions import urlkit


class TestUrlSplit:
    def test_basic(self):
        assert urlkit.url_split("http://example.com/a/b?x=1") == (
            "http", "example.com", "/a/b?x=1")

    def test_empty_path_becomes_slash(self):
        assert urlkit.url_split("https://example.com") == ("https", "example.com", "/")

    def test_space_percent20_roundtrip(self):
        # http.py:99-100: %20 -> space -> strip -> space -> %20
        assert urlkit.url_strip("  /a%20b ") == "/a%20b"
        assert urlkit.url_strip("/a b") == "/a%20b"

    def test_query_preserved(self):
        scheme, host, path = urlkit.url_split("http://h.no/p?q=1&r=2")
        assert path == "/p?q=1&r=2"


class TestUrlJoin:
    def test_join(self):
        assert urlkit.url_join("http", "h.no", "/p") == "http://h.no/p"

    def test_leading_slash_added(self):
        assert urlkit.url_join("http", "h.no", "p") == "http://h.no/p"

    def test_empty_path(self):
        assert urlkit.url_join("http", "h.no", "") == "http://h.no/"


class TestUrlJoinRelNorm:
    """http.py:118-139 byte-level contract."""

    def test_relative(self):
        assert (
            urlkit.url_join_rel_norm("http://h.no/a/b.html", "c.html")
            == "http://h.no/a/c.html"
        )

    def test_parent(self):
        assert (
            urlkit.url_join_rel_norm("http://h.no/a/b/c.html", "../d.html")
            == "http://h.no/a/d.html"
        )

    def test_absolute_path(self):
        assert urlkit.url_join_rel_norm("http://h.no/a/b", "/x/y") == "http://h.no/x/y"

    def test_fragment_kept_in_path(self):
        # http.py:120-121 passes allow_fragments=False, so '#frag' stays part
        # of the path (the reference never splits fragments off)
        assert urlkit.url_join_rel_norm("http://h.no/a", "b#frag") == "http://h.no/b#frag"

    def test_keeps_single_trailing_slash(self):
        assert urlkit.url_join_rel_norm("http://h.no/a/", "b/") == "http://h.no/a/b/"

    def test_trailing_host_dot_stripped(self):
        assert urlkit.url_join_rel_norm("http://h.no/", "http://x.com./p") == "http://x.com/p"

    def test_spaces_removed(self):
        assert urlkit.url_join_rel_norm("http://h.no/", "http://x.com/a b") == "http://x.com/ab"

    def test_other_host(self):
        assert (
            urlkit.url_join_rel_norm("http://h.no/a", "https://other.no/x")
            == "https://other.no/x"
        )

    def test_empty_target_path(self):
        assert urlkit.url_join_rel_norm("http://h.no/a/b", "?q=1") == "http://h.no/?q=1"


class TestSanitisePath:
    """domain.py:31-33, 142-144."""

    def test_session_id_stripped(self):
        assert urlkit.sanitise_path("/x?sid=abc123") == "/x"
        assert urlkit.sanitise_path("/x;jsessionid=foo") == "/x"
        assert urlkit.sanitise_path("/x?utm_source=tw") == "/x"

    def test_phpsessid(self):
        assert urlkit.sanitise_path("/p?PHPSESSID=9") == "/p"

    def test_plain_path_unchanged(self):
        assert urlkit.sanitise_path("/a/b.html?q=1") == "/a/b.html?q=1"


class TestHostChecks:
    """http.py:154-193; reason strings must match exactly."""

    def test_too_long(self):
        assert urlkit.check_url_host("a" * 51 + ".no") == "too-long"

    def test_www_www(self):
        assert urlkit.check_url_host("www.www.x.no") == "repetitive"

    def test_repetitive_parts(self):
        assert urlkit.check_url_host("a.a.a.a.a.no") == "repetitive"

    def test_blacklisted_tld(self):
        assert urlkit.check_url_host("spam.tk") == "blacklisted-TLD"

    def test_ok(self):
        assert urlkit.check_url_host("example.no") is None

    def test_empty_page_external(self):
        # EXTRACT_EMPTY_PAGE_EXTERNAL_LINKS=False -> external links from
        # empty pages rejected (http.py:187-193)
        assert urlkit.check_url_host("other.no", "src.no", empty_page=True) == "empty-page"

    def test_empty_page_internal_allowed(self):
        assert urlkit.check_url_host("src.no", "src.no", empty_page=True) is None


class TestDomainListFiles:
    """Domain black/whitelist FILE support (http.py:59-75, 169-186;
    config.py:183-204): regex-fragment lists with '#' comments, exact list,
    precedence blacklist > whitelist > TLD lists — every reference reason
    string exercised (VERDICT r1 #9)."""

    @pytest.fixture()
    def lists(self, tmp_path, monkeypatch):
        from macocu_crawler_spark import config as cfg

        black = tmp_path / "black.txt"
        black.write_text("badsite\\.no  # regex fragment, comment stripped\n"
                         "spam.*\n\n")
        exact = tmp_path / "exact.txt"
        exact.write_text("evil.no\nondskap.no\n")
        white = tmp_path / "white.txt"
        white.write_text("# allowed domains\nfin\\.tk\nsnill\\.xx\n")

        def _use(black_p=None, exact_p=None, white_p=None, tld_white=""):
            monkeypatch.setattr(cfg, "DOMAIN_BLACKLIST_PATH",
                                str(black) if black_p else None)
            monkeypatch.setattr(cfg, "DOMAIN_BLACKLIST_EXACT_PATH",
                                str(exact) if exact_p else None)
            monkeypatch.setattr(cfg, "DOMAIN_WHITELIST_PATH",
                                str(white) if white_p else None)
            if tld_white:
                monkeypatch.setattr(urlkit, "TLD_WHITELIST_RE",
                                    __import__("re").compile(tld_white))
            urlkit._domain_list_files.cache_clear()

        yield _use
        urlkit._domain_list_files.cache_clear()

    def test_blacklisted_domain_regex(self, lists):
        lists(black_p=True)
        assert urlkit.check_url_host("badsite.no") == "blacklisted-domain"
        assert urlkit.check_url_host("sub.badsite.no") == "blacklisted-domain"
        assert urlkit.check_url_host("spammy.no") == "blacklisted-domain"  # spam.* fragment
        assert urlkit.check_url_host("notbadsite.no") is None  # label boundary

    def test_blacklisted_domain_exact(self, lists):
        lists(exact_p=True)
        assert urlkit.check_url_host("evil.no") == "blacklisted-domain"
        # exact list: subdomains do NOT match (http.py:176)
        assert urlkit.check_url_host("sub.evil.no") is None

    def test_blacklisted_tld_with_whitelist(self, lists):
        lists(white_p=True)
        # .tk is TLD-blacklisted; whitelisted domain passes, others get the
        # combined reason string
        assert urlkit.check_url_host("fin.tk") is None
        assert urlkit.check_url_host("spam.tk") == "blacklisted-TLD+not-white-domain"

    def test_unaccepted_tld_with_and_without_whitelist(self, lists):
        lists(tld_white=r"\.no$")
        assert urlkit.check_url_host("utenfor.se") == "unaccepted-TLD"
        lists(white_p=True, tld_white=r"\.no$")
        assert urlkit.check_url_host("snill.xx") is None
        assert urlkit.check_url_host("slem.xx") == "unaccepted-TLD+not-white-domain"

    def test_blacklist_beats_whitelist(self, lists):
        # precedence: blacklist > whitelist (config.py:199-200)
        lists(black_p=True, white_p=True)
        assert urlkit.check_url_host("badsite.no") == "blacklisted-domain"


class TestPathChecks:
    """http.py:195-212."""

    def test_too_long(self):
        assert urlkit.check_url_path("/" + "a" * 500) == "too-long"

    def test_too_many_slashes(self):
        assert urlkit.check_url_path("/a" * 31) == "too-long"

    def test_repetitive(self):
        assert urlkit.check_url_path("/x/x/x/x/x/x") == "repetitive"

    def test_bad_extension(self):
        assert urlkit.check_url_path("/img/logo.PNG") == "bad-file-type"
        assert urlkit.check_url_path("/a.zip") == "bad-file-type"

    def test_binary_extension(self):
        assert urlkit.check_url_path("/doc/report.pdf") == "binary-file"

    def test_ok(self):
        assert urlkit.check_url_path("/a/b.html") is None


class TestFullCheck:
    """http.py:214-234."""

    def test_invalid(self):
        assert urlkit.url_split_and_check_parts("notaurl")[1] == "url-invalid-or-short"

    def test_short(self):
        assert urlkit.url_split_and_check_parts("http://a.b")[1] == "url-invalid-or-short"

    def test_scheme(self):
        assert urlkit.url_split_and_check_parts("ftp://example.com/xx") == (
            None, "url-invalid-or-short")

    def test_ok(self):
        parts, reason = urlkit.url_split_and_check_parts("http://example.no/page.html")
        assert reason is None
        assert parts == ("http", "example.no", "/page.html")

    def test_whitespace_squashed(self):
        parts, _ = urlkit.url_split_and_check_parts("http://exam ple.no/page.html")
        assert parts == ("http", "example.no", "/page.html")

    def test_host_reason_prefixed(self):
        assert urlkit.url_split_and_check_parts("http://spam.tk/page.html")[1] == (
            "host-blacklisted-TLD")

    def test_path_reason_prefixed(self):
        assert urlkit.url_split_and_check_parts("http://example.no/a.jpg")[1] == (
            "path-bad-file-type")


class TestHeaderExtracts:
    def test_file_type(self):
        hdr = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        assert urlkit.extract_file_type(hdr) == "html"

    def test_file_type_unknown(self):
        assert urlkit.extract_file_type(b"Content-Type: image/png\r\n") is None

    def test_last_modified(self):
        hdr = b"Last-Modified: Tue, 15 Aug 2023 10:00:00 GMT\r\n"
        assert urlkit.extract_last_modified(hdr) == "2023-08-15"

    def test_last_modified_missing(self):
        assert urlkit.extract_last_modified(b"HTTP/1.1 200 OK\r\n") is None


class TestCleanUrlDisplay:
    def test_xml_escape_and_truncate(self):
        # NB: the reference's clean_xml_val (util/__init__.py:302-306) does
        # NOT escape '&' — only " < > ' (differentially verified in
        # test_reference_differential.py)
        out = urlkit.clean_url_display("HTTP", "Example.NO", "/a&b")
        assert out == "http://example.no/a&b"
        out2 = urlkit.clean_url_display("http", "a.no", "/x\"<'>.html")
        assert out2 == "http://a.no/x&quot;&lt;&apos;&gt;.html"

    def test_blogspot_squash(self):
        out = urlkit.clean_url_display("http", "x.blogspot.cz", "/p")
        assert out == "http://x.blogspot.com/p"

    def test_idna(self):
        out = urlkit.clean_url_display("http", "xn--j1ay.xn--p1ai", "/")
        assert out == "http://кц.рф/"
