"""Property-based robustness tests (hypothesis): the URL kernel, trigram
math and robots parser must never crash or hang on adversarial input —
these functions sit in UDFs where one bad row would fail a 100 TB job."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from macocu_crawler_spark.functions import robots, urlkit
from macocu_crawler_spark.functions.trigram import TrigramModel

printable = st.text(alphabet=string.printable, max_size=200)
urlish = st.text(
    alphabet=string.ascii_lowercase + string.digits + ":/.?&=%#_- ", max_size=150
)


class TestUrlKernelTotality:
    @given(urlish, urlish)
    @settings(max_examples=300, deadline=None)
    def test_url_join_rel_norm_total(self, base, href):
        """Never raises anything but ValueError; output is a str."""
        try:
            out = urlkit.url_join_rel_norm("http://h.no/" + base, href)
        except ValueError:
            return
        assert isinstance(out, str)

    @given(printable)
    @settings(max_examples=300, deadline=None)
    def test_check_parts_total_and_reasoned(self, url):
        parts, reason = urlkit.url_split_and_check_parts(url)
        assert (parts is None) != (reason is None)
        if parts:
            scheme, host, path = parts
            assert scheme in ("http", "https")
            assert host and len(host) <= 50

    @given(urlish)
    @settings(max_examples=300, deadline=None)
    def test_sanitise_path_idempotent(self, path):
        once = urlkit.sanitise_path(path)
        assert urlkit.sanitise_path(once) == once


class TestTrigramProperties:
    @given(printable, printable)
    @settings(max_examples=200, deadline=None)
    def test_diff_bounded_and_symmetric(self, a, b):
        ma, mb = TrigramModel(a), TrigramModel(b)
        d1, d2 = ma.diff(mb), mb.diff(ma)
        assert abs(d1 - d2) < 1e-12
        assert -1e-9 <= d1 <= 1 + 1e-9

    @given(printable)
    @settings(max_examples=200, deadline=None)
    def test_self_similarity(self, text):
        m = TrigramModel(text)
        if m.norm:
            assert abs(m.diff(TrigramModel(text))) < 1e-9

    @given(printable)
    @settings(max_examples=200, deadline=None)
    def test_whitespace_normalisation_invariant(self, text):
        assert TrigramModel(text.replace(" ", "   ")).counts == TrigramModel(text).counts


class TestRobotsTotality:
    @given(printable, urlish)
    @settings(max_examples=300, deadline=None)
    def test_parse_and_match_never_crash(self, body, path):
        rules = robots.parse(body)
        assert isinstance(rules.is_allowed("bot", "/" + path), bool)

    @given(st.integers(min_value=1, max_value=200))
    @settings(max_examples=20, deadline=None)
    def test_hostile_wildcard_runs_fast(self, n):
        """The re2-motivated case: runs of '*' must not backtrack-explode."""
        rules = robots.parse(f"User-agent: *\nDisallow: /{'*' * n}.js$")
        rules.is_allowed("bot", "/" + "a" * 100 + ".jsx")
