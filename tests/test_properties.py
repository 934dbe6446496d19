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


class TestCuckooProperties:
    """Hypothesis properties of the cuckoo URL-seen kernel: under ANY
    interleaving of bulk inserts and deletes (duplicates included), every
    key the reference multiset still holds must probe TRUE — the
    zero-false-negative invariant admission rides on."""

    @staticmethod
    def _hashes(keys):
        import hashlib

        import numpy as np

        h1 = np.array(
            [int.from_bytes(hashlib.blake2b(
                k.encode(), digest_size=8, person=b"cuckoo-1").digest(), "big")
             for k in keys],
            dtype=np.uint64,
        )
        h2 = np.array(
            [int.from_bytes(hashlib.blake2b(
                k.encode(), digest_size=8, person=b"cuckoo-2").digest(), "big")
             for k in keys],
            dtype=np.uint64,
        )
        return h1, h2

    @given(
        ops=st.lists(
            st.tuples(
                st.sampled_from(["insert", "delete"]),
                st.lists(st.integers(0, 400), min_size=1, max_size=120),
            ),
            min_size=1,
            max_size=12,
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_no_false_negatives_under_any_interleaving(self, ops):
        from collections import Counter

        from macocu_crawler_spark.operators.urlseen import _CuckooTable

        t = _CuckooTable(64)  # tiny: forces kicks and the overflow path
        live = Counter()
        for op, ids in ops:
            keys = [f"k{i}" for i in ids]
            if op == "insert":
                h1, h2 = self._hashes(keys)
                t.insert_bulk(h1, h2)
                live.update(keys)
            else:
                # delete only keys currently live (the documented
                # contract: never delete what was not inserted)
                deletable = [k for k in keys if live[k] > 0]
                if not deletable:
                    continue
                h1, h2 = self._hashes(deletable)
                t.delete_bulk(h1, h2)
                live.subtract(deletable)
            remaining = [k for k, c in live.items() if c > 0]
            if remaining:
                h1, h2 = self._hashes(remaining)
                assert t.contains(h1, h2).all(), (op, remaining)

    def test_duplicate_insert_survives_single_delete(self):
        """Duplicates are stored, not coalesced: insert the same key twice,
        delete once — the key must still be present (this is exactly why
        deleting an inserted key can never erase a doppelgänger's entry)."""
        from macocu_crawler_spark.operators.urlseen import _CuckooTable

        t = _CuckooTable(64)
        h1, h2 = self._hashes(["dup", "dup"])
        t.insert_bulk(h1, h2)
        assert t.delete_bulk(h1[:1], h2[:1]) == 1
        assert t.contains(h1[:1], h2[:1]).all()
        assert t.delete_bulk(h1[:1], h2[:1]) == 1
