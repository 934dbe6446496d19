"""Text pipeline unit tests: trigram math, boilerplate classification,
robots parsing, full-page processing (SURVEY.md §5.1-5.2)."""

import math

import pytest

from macocu_crawler_spark import config
from macocu_crawler_spark.functions import boilerplate, robots, textkit
from macocu_crawler_spark.functions.trigram import TrigramModel, lang_difference


class TestTrigram:
    def test_identical_texts_zero_diff(self):
        a, b = TrigramModel("hello world"), TrigramModel("hello world")
        assert a.diff(b) == pytest.approx(0.0)

    def test_disjoint_texts_full_diff(self):
        assert TrigramModel("aaaa").diff(TrigramModel("zzzz")) == pytest.approx(1.0)

    def test_hand_computed_cosine(self):
        # text "ab" -> windows over '  ' context + 'ab ': trigrams
        # '  a', ' ab', 'ab ' each once => norm = sqrt(3)
        m = TrigramModel("ab")
        assert m.norm == pytest.approx(math.sqrt(3))
        assert m.counts == {"  a": 1, " ab": 1, "ab ": 1}

    def test_whitespace_normalised(self):
        assert TrigramModel("a  b\nc").counts == TrigramModel("a b c").counts

    def test_context_carries_across_lines(self):
        # trigrams.py:43-55: `pair` persists over the lines iterable
        m = TrigramModel()
        m.add_lines(["ab", "cd"])
        m2 = TrigramModel()
        m2.add_lines(["ab cd"])
        assert set(m.counts) != set(TrigramModel("ab").counts | TrigramModel("cd").counts)
        assert m2.counts["b c"] == 1

    def test_lang_models_distinguish(self):
        models = textkit.get_lang_models()
        en = "The committee will discuss the budget for the school year."
        no = "Utvalget skal diskutere budsjettet for skoleåret på torsdag."
        assert lang_difference(models["English"], en) < lang_difference(
            models["Norwegian"], en)
        assert lang_difference(models["Norwegian"], no) < lang_difference(
            models["English"], no)


GOOD_NO_PAR = (
    "Kommunen la fram en ny plan for å forbedre kollektivtrafikken i hele "
    "regionen neste år, og mange av innbyggerne var glade for nyheten om "
    "bedre busstilbud i bygda der de bor."
)
GOOD_EN_PAR = (
    "The city council announced a new plan to improve public transport "
    "across the whole region next year, and many of the people who live "
    "there were happy about the news of better bus services."
)


def page_html(paragraphs, title="Testside", lang="no", extra_head="", body_extra=""):
    pars = "\n".join(f"<p>{p}</p>" for p in paragraphs)
    return (
        f'<html lang="{lang}"><head><meta charset="utf-8"><title>{title}</title>'
        f"{extra_head}</head><body>{pars}{body_extra}</body></html>"
    )


class TestBoilerplate:
    def test_make_paragraphs_splits_blocks(self):
        pars, title = boilerplate.make_paragraphs(
            "<html><head><title>T</title></head><body><p>one two</p>"
            "<div>three four</div></body></html>")
        assert title == "T"
        assert [p["text"] for p in pars] == ["one two", "three four"]

    def test_link_chars_counted(self):
        pars, _ = boilerplate.make_paragraphs(
            "<body><p>abc <a href='/x'>link</a> def</p></body>")
        assert pars[0]["linked_char_count"] == 4

    def test_script_style_dropped(self):
        pars, _ = boilerplate.make_paragraphs(
            "<body><script>var x=1;</script><p>kept</p><style>p{}</style></body>")
        assert [p["text"] for p in pars] == ["kept"]

    def test_double_br_splits(self):
        pars, _ = boilerplate.make_paragraphs("<body><p>a1 a2<br><br>b1 b2</p></body>")
        assert [p["text"] for p in pars] == ["a1 a2", "b1 b2"]

    def test_classification_long_stopworded_good(self):
        pars, _ = boilerplate.make_paragraphs(page_html([GOOD_NO_PAR]))
        boilerplate.classify_paragraphs(
            pars, textkit.get_stoplists()["Norwegian"],
            config.JUSTEXT_LENGTH_LOW, config.JUSTEXT_LENGTH_HIGH,
            config.JUSTEXT_STOPWORDS_LOW, config.JUSTEXT_STOPWORDS_HIGH,
            config.JUSTEXT_MAX_LINK_DENSITY)
        assert pars[0]["cfclass"] == "good"

    def test_classification_nav_links_bad(self):
        nav = "<div>" + "".join(f'<a href="/p{i}">side {i}</a> ' for i in range(10)) + "</div>"
        pars, _ = boilerplate.make_paragraphs(f"<body>{nav}<p>{GOOD_NO_PAR}</p></body>")
        boilerplate.classify_paragraphs(
            pars, textkit.get_stoplists()["Norwegian"],
            config.JUSTEXT_LENGTH_LOW, config.JUSTEXT_LENGTH_HIGH,
            config.JUSTEXT_STOPWORDS_LOW, config.JUSTEXT_STOPWORDS_HIGH,
            config.JUSTEXT_MAX_LINK_DENSITY)
        boilerplate.revise_paragraph_classification(
            pars, config.JUSTEXT_MAX_GOOD_DISTANCE, config.JUSTEXT_MAX_HEADING_DISTANCE)
        assert pars[0]["class"] == "bad"      # link density > 0.4
        assert pars[-1]["class"] == "good"

    def test_copyright_bad(self):
        pars, _ = boilerplate.make_paragraphs(f"<body><p>\xa9 2024 Example {GOOD_NO_PAR}</p></body>")
        boilerplate.classify_paragraphs(
            pars, textkit.get_stoplists()["Norwegian"], 50, 100, 0.2, 0.3, 0.4)
        assert pars[0]["cfclass"] == "bad"

    def test_short_heading_near_good_promoted(self):
        html = f"<body><h1>Om oss og om bygda</h1><p>{GOOD_NO_PAR}</p></body>"
        pars, _ = boilerplate.make_paragraphs(html)
        boilerplate.classify_paragraphs(
            pars, textkit.get_stoplists()["Norwegian"], 50, 100, 0.2, 0.3, 0.4)
        assert pars[0]["heading"] and pars[0]["cfclass"] == "short"
        boilerplate.revise_paragraph_classification(pars, 5, 150)
        assert pars[0]["class"] == "good"  # neargood heading adjacent to good

    def test_html_escape(self):
        assert boilerplate.html_escape("a < b & c > d") == "a &lt; b &amp; c &gt; d"


class TestRobots:
    def test_allow_all_empty(self):
        rules = robots.parse("")
        assert rules.is_allowed("bot", "/anything")

    def test_disallow_all(self):
        rules = robots.parse("User-agent: *\nDisallow: /")
        assert not rules.is_allowed("bot", "/x")

    def test_path_specific(self):
        rules = robots.parse("User-agent: *\nDisallow: /private/\nAllow: /")
        assert not rules.is_allowed("bot", "/private/x")
        assert rules.is_allowed("bot", "/public")

    def test_first_match_wins(self):
        rules = robots.parse("User-agent: *\nAllow: /private/ok\nDisallow: /private/")
        assert rules.is_allowed("bot", "/private/ok.html")
        assert not rules.is_allowed("bot", "/private/no.html")

    def test_gym2008_wildcard(self):
        rules = robots.parse("User-agent: *\nDisallow: /*.php$")
        assert not rules.is_allowed("bot", "/index.php")
        assert rules.is_allowed("bot", "/index.php?x=1")
        assert rules.is_allowed("bot", "/index.html")

    def test_gym2008_star(self):
        rules = robots.parse("User-agent: *\nDisallow: /a/*/c")
        assert not rules.is_allowed("bot", "/a/b/c")
        assert rules.is_allowed("bot", "/a/b/d")

    def test_hostile_wildcard_run_safe(self):
        rules = robots.parse("User-agent: *\nAllow: /*********.js$")
        assert rules.is_allowed("bot", "/app.js")

    def test_empty_disallow_negation(self):
        # robotparser.py:183-186: "Disallow:" (blank) means allow everything
        rules = robots.parse("User-agent: *\nDisallow:  \nDisallow: /x")
        assert rules.is_allowed("bot", "/anything")

    def test_ua_substring_match(self):
        body = "User-agent: special\nDisallow: /\n\nUser-agent: *\nDisallow: /priv"
        rules = robots.parse(body)
        assert not rules.is_allowed("my-special-bot 1.0", "/ok")
        assert rules.is_allowed("other", "/ok")
        assert not rules.is_allowed("other", "/priv/x")

    def test_crawl_delay(self):
        rules, delay = robots.parse_and_get_crawl_delay(
            "User-agent: *\nCrawl-delay: 3.5\nDisallow: /x", "bot")
        assert delay == 3.5

    def test_percent_unquote_except_2f(self):
        rules = robots.parse("User-agent: *\nDisallow: /a%3cb")
        assert not rules.is_allowed("bot", "/a<b")


class TestProcessPage:
    HDR = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"

    def _process(self, html, **kw):
        return textkit.process_page(
            wpage_id=1, url="http://example.no/side.html",
            html_bs=html.encode("utf-8"), http_header=self.HDR,
            connect_time="20230815100000", ip="10.0.0.1", **kw)

    def test_norwegian_page_accepted(self):
        row = self._process(page_html([GOOD_NO_PAR, GOOD_NO_PAR + " Og mer tekst om planen."]))
        assert row["lang"] == "Norwegian"
        assert row["txt_len"] > 0
        assert GOOD_NO_PAR.replace("å", "å") in row["text"]
        assert row["prevert"].startswith('<doc id="1" title="Testside"')
        assert 'crawl_date="2023-08-15 10:00"' in row["prevert"]

    def test_english_page_rejected_no_links(self):
        html = page_html([GOOD_EN_PAR], lang="en",
                         body_extra='<a href="/next.html">more stuff here</a>')
        row = self._process(html)
        assert row["lang"] == "English"
        assert row["txt_len"] == 0
        assert row["links"] == []  # process.py:607-624: html_root stays None
        assert any("unaccepted language" in m for m in row["error_msgs"])

    def test_mt_page_dropped(self):
        html = page_html([GOOD_NO_PAR], extra_head='<meta name="generator" content="qtranslate">')
        row = self._process(html)
        assert row["txt_len"] == 0
        assert "cannot extract text" in row["error_msgs"]

    def test_links_extracted_and_checked(self):
        body_extra = (
            '<a href="side2.html">mer om planen i kommunen</a>'
            '<a href="http://spam.tk/x.html">spam</a>'
            '<a href="/bilde.jpg">bilde</a>'
            '<a href="/rapport.pdf">rapport</a>'
            '<a rel="nofollow" href="/hemmelig.html">nei</a>')
        row = self._process(page_html([GOOD_NO_PAR], body_extra=body_extra))
        assert ("http", "example.no", "/side2.html") in row["links"]
        assert row["binfile_links"] == ["http://example.no/rapport.pdf"]
        reasons = {r for r, u in row["ignored_links"]}
        assert reasons == {"host-blacklisted-TLD", "path-bad-file-type"}
        assert all("/hemmelig" not in u for _, u in row["ignored_links"])

    def test_base_href_respected(self):
        body_extra = '<a href="rel.html">relativ lenke til noe</a>'
        html = page_html([GOOD_NO_PAR], extra_head='<base href="http://example.no/dypt/">',
                         body_extra=body_extra)
        row = self._process(html)
        assert ("http", "example.no", "/dypt/rel.html") in row["links"]

    def test_iso_8859_1_meta_decode(self):
        html = (
            '<html><head><meta http-equiv="content-type" '
            'content="text/html; charset=iso-8859-1"><title>Æøå</title></head>'
            f"<body><p>{GOOD_NO_PAR}</p></body></html>")
        row = textkit.process_page(
            1, "http://example.no/l.html", html.encode("iso-8859-1"),
            self.HDR.replace(b"utf-8", b"iso-8859-1"), "20230815100000", "10.0.0.1")
        assert row["enc_meta"] == "iso8859-1"
        assert row["txt_len"] > 0

    def test_title_truncated_300(self):
        row = self._process(page_html([GOOD_NO_PAR], title="x" * 400))
        assert len(row["title"]) == 300

    def test_xml_header_stripped(self):
        # reference XML_HEADER_RE (process.py:227) strips to end-of-line, so
        # the header must sit on its own line (as in real pages)
        html = '<?xml version="1.0" encoding="utf-8"?>\n' + page_html([GOOD_NO_PAR])
        assert self._process(html)["txt_len"] > 0

    def test_token_count(self):
        row = self._process(page_html([GOOD_NO_PAR]))
        assert row["token_count"] == len(row["text"].split())

    def test_text_plain_branch(self):
        # process.py:278-299: blank-line paragraph split, word_count set
        body = (GOOD_NO_PAR + "\n\n" + GOOD_NO_PAR + " Enda en setning til her.").encode()
        row = textkit.process_page(
            3, "http://example.no/ren.txt", body,
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n",
            "20230815100000", "10.0.0.1")
        assert row["file_type"] == "txt"
        assert row["lang"] == "Norwegian"
        assert row["txt_len"] > 0
        assert row["text"].count("\n") >= 1  # both paragraphs kept
        assert row["links"] == []

    def test_undeclared_legacy_encoding_detected(self):
        # iso-8859-1 bytes, NO meta charset: the chared-equivalent detector
        # (functions/charset.py) recovers the encoding — the reference with
        # chared does the same (process.py:195-206)
        html = f"<html><body><p>Blåbærsyltetøy og rømmegrøt. {GOOD_NO_PAR}</p></body></html>"
        row = textkit.process_page(
            1, "http://example.no/x.html", html.encode("iso-8859-1"),
            self.HDR, "20230815100000", "10.0.0.1")
        assert row["txt_len"] > 0
        assert row["enc_chared"] == "iso8859-1"
        assert "Blåbærsyltetøy" in row["text"]

    def test_undeclared_legacy_encoding_fails_cleanly_without_detector(self, monkeypatch):
        # with the detector off the ladder ends at strict utf-8
        # (process.py:213-214) -> no text, no crash
        from macocu_crawler_spark import config as cfg

        monkeypatch.setattr(cfg, "CHARSET_DETECTOR", False)
        html = f"<html><body><p>Blåbærsyltetøy og rømmegrøt. {GOOD_NO_PAR}</p></body></html>"
        row = textkit.process_page(
            1, "http://example.no/x.html", html.encode("iso-8859-1"),
            self.HDR, "20230815100000", "10.0.0.1")
        assert row["txt_len"] == 0
        assert "cannot extract text" in row["error_msgs"]

    def test_lying_meta_charset_overridden_by_detector(self):
        # the <meta> claims utf-8 but the bytes are iso-8859-1: detector
        # precedence beats the meta (chared→meta→utf-8, process.py:195-214)
        html = (
            '<html><head><meta charset="utf-8"><title>Løgn</title></head>'
            f"<body><p>Grønnsaker og blåbær. {GOOD_NO_PAR}</p></body></html>"
        )
        row = textkit.process_page(
            1, "http://example.no/lyver.html", html.encode("iso-8859-1"),
            self.HDR, "20230815100000", "10.0.0.1")
        assert row["enc_meta"] == "utf-8"
        assert row["enc_chared"] == "iso8859-1"
        assert "Grønnsaker" in row["text"]

    def test_detector_keeps_utf8_pages_utf8(self):
        # a genuinely-utf-8 page with Norwegian chars must NOT be misranked
        # into a legacy decode (mojibake hazard)
        row = self._process(page_html([f"Blåbær og kjøttkaker. {GOOD_NO_PAR}"]))
        assert row["enc_chared"] == "utf-8"
        assert "Blåbær" in row["text"]


class TestUnigramModel:
    def test_matches_reference_semantics(self):
        # trigrams1.py: whitespace (incl. newlines) collapses to single
        # spaces, then each char of strip()+' ' is counted
        from macocu_crawler_spark.functions.trigram import UnigramModel

        m = UnigramModel("ab  a\nb")  # -> stream "ab a b "
        assert m.counts == {"a": 2, "b": 2, " ": 3}
        m2 = UnigramModel()
        m2.add_lines(["ab", "b"])  # two lines -> "ab b "
        assert m2.counts == {"a": 1, "b": 2, " ": 2}

    def test_distinguishes_scripts(self):
        from macocu_crawler_spark.functions.trigram import UnigramModel

        cjk = UnigramModel("这是一个中文句子 我们用它来测试")
        latin = UnigramModel("dette er en norsk setning")
        probe = UnigramModel("另一个中文句子 测试用")
        assert cjk.diff(probe) < latin.diff(probe)


class TestAdviceRegressions:
    def test_charset_models_follow_language_config(self, monkeypatch):
        """ADVICE r2: the encoding models must re-key when config.LANGUAGES
        changes after warm-up (the lru_cache is keyed on the tuple, not
        warmed once)."""
        from macocu_crawler_spark import config
        from macocu_crawler_spark.functions import charset

        base = charset._encoding_models()
        monkeypatch.setattr(config, "LANGUAGES", ("English",))
        narrowed = charset._encoding_models()
        assert narrowed is not base  # different key → different models
        # and switching back returns the cached original
        monkeypatch.setattr(config, "LANGUAGES", ("English", "Norwegian"))
        assert charset._encoding_models() is base

    def test_increasing_range_tiny_end(self):
        """ADVICE r2: end < step_count must not raise (step clamps to 1) —
        reachable via CrawlParams(min_url_select=2..9)."""
        from macocu_crawler_spark.config import increasing_range

        ramp = increasing_range(1, 5)
        assert ramp[0] == 1 and ramp[-1] == 5
        assert ramp == sorted(ramp)
        # reference semantics preserved where end >= step_count
        assert increasing_range(1, 300) == [1] + list(range(1, 300, 30)) + [300]
