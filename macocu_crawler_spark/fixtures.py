"""Deterministic synthetic web for tests and bench (FIXTURES.md, SURVEY §7 M0).

Builds, with a fixed seed and no external data:

- ``pages``     one row per fetchable page (BASELINE.json input_hint shape:
                url, warc_ts, html:binary, text, lang + ip/http_header/wpage_id);
                the ``text`` column is the byte-identical oracle, computed by
                running the row-level pipeline (textkit.process_page) at build
                time
- ``robots``    (scheme, host, state, body) — FILE/EMPTY/FAIL archetypes
- ``dns``       (scheme, host, ip) — some hosts share an IP, one is NO_HOST
- ``redirects`` (url, location)
- ``seeds``     seed URL list (with a comment line and a schemeless host)

Host archetypes exercise the reference branches (citations in FIXTURES.md):
good Norwegian hosts, a hot host (skew), an English host (killed by the
yield rule), robots-disallowed, crawl-delay, dead DNS, redirect host,
blacklisted-TLD links, repetitive-host links, session-id path boilerplate,
iso-8859-1 meta charset, MT marker page, exact text/html duplicate pairs,
tiny (<DOC_SIZE_MIN) body.
"""

from __future__ import annotations

import datetime as dt
import os
import random
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from .functions import textkit

NO_HOST = "NO_HOST"
BASE_TS = dt.datetime(2023, 8, 15, 10, 0, 0)

# Sentence pools — distinct from data/lang_samples so language ID is a real
# decision, not memorisation.
NO_SENTENCES = [
    "Styret i idrettslaget vedtok å bygge en ny løype gjennom skogen ovenfor skolen.",
    "Mange av husene i gaten ble malt på nytt i løpet av den varme sommeren i fjor.",
    "Fergen mellom øyene går sjeldnere om vinteren, så folk planlegger innkjøpene sine nøye.",
    "Den gamle læreren samlet elevene rundt kartet og fortalte om reisen over fjellet.",
    "Etter møtet ble det servert kaffe og boller, og naboene ble sittende lenge og prate.",
    "Kommunestyret diskuterte lenge hvordan midlene til veivedlikehold skulle fordeles i år.",
    "Butikken på kaia selger fersk fisk hver morgen, og køen strekker seg ofte ut døren.",
    "Barnehagen fikk nye lekeapparater, og ungene brukte hele formiddagen på å prøve dem.",
    "Toget mot byen var forsinket på grunn av arbeid på linjen mellom de to stasjonene.",
    "Hun skrev en lang rapport om tilstanden til broene i distriktet før fristen gikk ut.",
    "Om høsten samles familien for å plukke bær i liene ovenfor det gamle setret.",
    "Biblioteket arrangerer lesestunder for barn hver onsdag ettermiddag gjennom hele året.",
    "Fiskerne mente at kvotene burde fordeles annerledes mellom de små og store båtene.",
    "Den nye svømmehallen åpner i mars, og billettprisene blir de samme som i nabobyen.",
    "Ordføreren inviterte til folkemøte om planene for det nye torget midt i sentrum.",
    "Regnet varte i tre dager, og elven steg nesten opp til den gamle steinbroen.",
    "Korpset øvde i gymsalen hver torsdag, og lyden kunne høres helt ned til fergeleiet.",
    "Bonden reparerte gjerdet langs veien før dyrene skulle slippes ut på beite i mai.",
    "Avisen skrev om den unge forskeren som hadde funnet en sjelden plante i myra.",
    "Turistkontoret laget en ny brosjyre med kart over stiene rundt det store vannet.",
]
EN_SENTENCES = [
    "The committee approved the annual budget after a long discussion about road repairs.",
    "Visitors can reach the island by ferry, which departs from the harbour every two hours.",
    "The research group published their findings about coastal erosion in a well-known journal.",
    "Local shops reported higher sales during the festival week than in any previous year.",
    "The school board decided to extend the library opening hours during the exam period.",
    "A new hiking trail connects the old lighthouse with the visitor centre by the bay.",
    "The council plans to replace the street lamps with more efficient models next spring.",
    "Farmers in the valley expect a good harvest if the dry weather continues through August.",
    "The museum's new wing will host a permanent exhibition about the region's fishing history.",
    "Engineers inspected the bridge and concluded that the repairs could wait until autumn.",
]
NAV_WORDS = ["Hjem", "Nyheter", "Om oss", "Kontakt", "Arkiv", "Lenker", "Kart", "Søk"]


def _paragraphs(rng: random.Random, pool: list[str], n: int) -> list[str]:
    return [" ".join(rng.choice(pool) for _ in range(rng.randint(2, 4))) for _ in range(n)]


def render_page(
    rng: random.Random,
    title: str,
    paragraphs: list[str],
    links: list[tuple[str, str]],
    nav_links: list[str] | None = None,
    base_href: str | None = None,
    charset: str = "utf-8",
    mt_marker: bool = False,
    nofollow: list[str] | None = None,
    heading: str | None = None,
) -> bytes:
    """Render one synthetic page; returns encoded bytes."""
    head = [f'<title>{title}</title>']
    if charset == "utf-8":
        head.append('<meta charset="utf-8">')
    else:
        head.append(
            f'<meta http-equiv="content-type" content="text/html; charset={charset}">'
        )
    if base_href:
        head.append(f'<base href="{base_href}">')
    if mt_marker:
        head.append('<meta name="generator" content="qtranslate-x">')
    body = []
    if nav_links:
        nav = " ".join(
            f'<a href="{href}">{rng.choice(NAV_WORDS)}</a>' for href in nav_links
        )
        body.append(f"<div>{nav}</div>")
    if heading:
        body.append(f"<h1>{heading}</h1>")
    for p in paragraphs:
        body.append(f"<p>{p}</p>")
    for href, anchor in links:
        body.append(f'<p><a href="{href}">{anchor}</a></p>')
    for href in nofollow or []:
        body.append(f'<a rel="nofollow" href="{href}">skjult lenke</a>')
    body.append("<div>\xa9 2023 Fixture AS — alle rettigheter</div>")
    html = (
        "<html><head>{}</head>\n<body>{}</body></html>".format(
            "".join(head), "\n".join(body)
        )
    )
    return html.encode(charset, errors="replace")


@dataclass
class FixtureWeb:
    pages: list[dict] = field(default_factory=list)       # url -> page row
    robots: list[dict] = field(default_factory=list)
    dns: list[dict] = field(default_factory=list)
    redirects: list[dict] = field(default_factory=list)
    seeds: list[str] = field(default_factory=list)

    def page_map(self) -> dict[str, dict]:
        return {p["url"]: p for p in self.pages}

    def robots_map(self) -> dict[tuple[str, str], dict]:
        return {(r["scheme"], r["host"]): r for r in self.robots}

    def dns_map(self) -> dict[str, str]:
        return {d["host"]: d["ip"] for d in self.dns}

    def redirect_map(self) -> dict[str, str]:
        return {r["url"]: r["location"] for r in self.redirects}


def _add_page(web: FixtureWeb, url: str, html: bytes, header: bytes | None = None) -> None:
    web.pages.append({"url": url, "html": html, "http_header": header})


HDR = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
HDR_LM = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
    b"Last-Modified: Tue, 01 Aug 2023 10:00:00 GMT\r\n\r\n"
)


def build_web(scale: int = 1, seed: int = 42) -> FixtureWeb:
    """Build the synthetic web.  ``scale`` multiplies page counts on the
    bulk hosts (hot.no / a.no / b.no) for bench runs; the archetype hosts
    stay fixed so correctness tests are scale-invariant."""
    rng = random.Random(seed)
    web = FixtureWeb()

    def no_pars(n):
        return _paragraphs(rng, NO_SENTENCES, n)

    def en_pars(n):
        return _paragraphs(rng, EN_SENTENCES, n)

    # --- seed.no: hub host -------------------------------------------------
    hub_links = [
        ("http://a.no/artikkel1.html", "les om planen her"),
        ("http://b.no/nyhet1.html", "siste nytt fra bygda"),
        ("http://hot.no/side1.html", "den store samlingen"),
        ("http://en.example/report1.html", "english report"),
        ("http://dead.no/index.html", "gammel side"),
        ("http://redirect.no/flyttet.html", "flyttet innhold"),
        ("http://disallowed.no/hemmelig.html", "lukket omraade"),
        ("http://delay.no/sakte1.html", "rolig side"),
        ("http://spam.tk/gratis.html", "gratis ting"),
        ("http://www.www.bad.no/x.html", "rar lenke"),
        ("http://sameip1.no/felles.html", "samme tjener en"),
        ("http://sameip2.no/felles.html", "samme tjener to"),
        ("http://sameip3.no/felles.html", "samme tjener tre"),
        ("http://flytta.no/side1.html", "flyttede regler"),
        ("http://evigrobots.no/tapt.html", "evige regler"),
    ]
    for i in range(4):
        links = hub_links if i == 0 else [
            ("/hub%d.html" % ((i + 1) % 4), "neste oversikt her"),
            ("http://a.no/artikkel%d.html" % (i + 1), "mer lesestoff om saken"),
        ]
        _add_page(
            web, f"http://seed.no/hub{i}.html",
            render_page(rng, f"Oversikt {i}", no_pars(3), links,
                        nav_links=["/hub%d.html" % j for j in range(4)]),
            HDR,
        )
    web.seeds = ["# fixture seeds", "http://seed.no/hub0.html", "seed.no"]

    # --- a.no: main Norwegian content host ---------------------------------
    n_a = 12 * scale
    for i in range(1, n_a + 1):
        links = [("artikkel%d.html" % (i + 1), "neste artikkel i serien")] if i < n_a else []
        if i == 3:
            links += [
                ("http://c.no/start.html", "en mindre nettside"),
                ("/felles.html?sid=abc123", "felles side"),
                ("/felles.html?sid=xyz789", "felles side igjen"),
            ]
        if i == 5:
            links += [("http://b.no/privat/skjult.html", "skjult for roboter")]
        base = "http://a.no/dypt/" if i == 7 else None
        if base:
            links = [("rel%d.html" % i, "relativ lenke her")] + links
        _add_page(
            web, f"http://a.no/artikkel{i}.html",
            render_page(rng, f"Artikkel {i}", no_pars(3), links,
                        nav_links=["/", "/arkiv.html"], base_href=base,
                        heading="Om artikkel %d" % i),
            HDR_LM if i % 3 == 0 else HDR,
        )
    _add_page(web, "http://a.no/dypt/rel7.html",
              render_page(rng, "Dyp side", no_pars(2), []), HDR)
    _add_page(web, "http://a.no/felles.html?sid=abc123",
              render_page(rng, "Felles", no_pars(2), []), HDR)
    _add_page(web, "http://a.no/felles.html?sid=xyz789",
              render_page(rng, "Felles", no_pars(2), []), HDR)
    # MT-marker page (dropped by F9), tiny page (< DOC_SIZE_MIN), latin-1 page
    _add_page(web, "http://a.no/mt.html",
              render_page(rng, "Oversatt", no_pars(2), [], mt_marker=True), HDR)
    _add_page(web, "http://a.no/liten.html", b"<html><body>kort</body></html>", HDR)
    # text/plain page: the txt branch of the pipeline (process.py:278-299);
    # paragraphs split on blank lines, all dom_path 'p'
    _add_page(
        web, "http://a.no/ren.txt",
        ("\n\n".join(" ".join(NO_SENTENCES[i:i + 3]) for i in (0, 3, 6))).encode("utf-8"),
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n",
    )
    # undeclared legacy encoding: iso-8859-1 bytes with NO meta charset —
    # recovered by the chared-equivalent detector (functions/charset.py),
    # exactly as the reference's chared branch would (process.py:195-206)
    _add_page(
        web, "http://a.no/knekt.html",
        ("<html><head><title>Ødelagt</title></head><body><p>"
         + " ".join(NO_SENTENCES[:3]) + "</p></body></html>").encode("iso-8859-1"),
        HDR,
    )
    # LYING meta: claims utf-8, bytes are iso-8859-1 — detector precedence
    # (chared→meta→utf-8) must override the meta
    _add_page(
        web, "http://a.no/lyver.html",
        ('<html><head><meta charset="utf-8"><title>Løgn</title></head><body><p>'
         + " ".join(NO_SENTENCES[3:6]) + "</p></body></html>").encode("iso-8859-1"),
        HDR,
    )
    _add_page(
        web, "http://a.no/latin1.html",
        render_page(rng, "Æøå på gammelt vis", no_pars(2), [], charset="iso-8859-1"),
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=iso-8859-1\r\n\r\n",
    )
    # link these from artikkel2
    web.pages = [p for p in web.pages]  # keep order
    # patch artikkel2 to include the special links
    a2 = next(p for p in web.pages if p["url"] == "http://a.no/artikkel2.html")
    a2["html"] = render_page(
        rng, "Artikkel 2", no_pars(3),
        [("artikkel3.html", "neste artikkel i serien"),
         ("/mt.html", "den oversatte siden"),
         ("/liten.html", "en bitteliten side"),
         ("/latin1.html", "gammel tegnkoding"),
         ("/lyver.html", "siden som lyver om tegnsett")],
        nav_links=["/", "/arkiv.html"], heading="Om artikkel 2",
        nofollow=["/hemmelig-intern.html"],
    )

    # --- b.no: robots-restricted host ---------------------------------------
    n_b = 8 * scale
    for i in range(1, n_b + 1):
        links = [("nyhet%d.html" % (i + 1), "flere nyheter her")] if i < n_b else []
        _add_page(
            web, f"http://b.no/nyhet{i}.html",
            render_page(rng, f"Nyhet {i}", no_pars(2), links, nav_links=["/"]),
            HDR,
        )
    _add_page(web, "http://b.no/privat/skjult.html",
              render_page(rng, "Skjult", no_pars(2), []), HDR)

    # --- c.no: distance-2 host with duplicate pages -------------------------
    _add_page(web, "http://c.no/start.html",
              render_page(rng, "Start", no_pars(2),
                          [("kopi.html", "en kjent tekst"), ("klon.html", "en kjent side")]),
              HDR)
    # kopi: same *text* as a.no/artikkel1 but different html framing (txt dup)
    a1 = next(p for p in web.pages if p["url"] == "http://a.no/artikkel1.html")
    a1_row = textkit.process_page(0, a1["url"], a1["html"], a1["http_header"], "20230815100000", "ip")
    kopi_pars = a1_row["text"].split("\n")
    _add_page(web, "http://c.no/kopi.html",
              render_page(rng, a1_row["title"], kopi_pars, [], nav_links=["/annet.html"]),
              HDR)
    # klon: byte-identical html to a.no/artikkel4 (raw dup)
    a4 = next(p for p in web.pages if p["url"] == "http://a.no/artikkel4.html")
    _add_page(web, "http://c.no/klon.html", a4["html"], HDR)

    # --- hot.no: the hot host (skew) ----------------------------------------
    n_hot = 40 * scale
    for i in range(1, n_hot + 1):
        links = [("side%d.html" % min(i + j, n_hot), "relatert side nummer %d" % (i + j))
                 for j in (1, 2) if i + j <= n_hot]
        _add_page(
            web, f"http://hot.no/side{i}.html",
            render_page(rng, f"Side {i}", no_pars(2), links, nav_links=["/"]),
            HDR,
        )

    # --- en.example: yield-poor English host --------------------------------
    for i in range(1, 16):
        links = [("report%d.html" % (i + 1), "next report in series")] if i < 15 else []
        _add_page(
            web, f"http://en.example/report{i}.html",
            render_page(rng, f"Report {i}", en_pars(3), links, nav_links=["/"]),
            HDR,
        )

    # --- delay.no: crawl-delay host ------------------------------------------
    for i in range(1, 4):
        links = [("sakte%d.html" % (i + 1), "neste rolige side")] if i < 3 else []
        _add_page(web, f"http://delay.no/sakte{i}.html",
                  render_page(rng, f"Sakte {i}", no_pars(2), links), HDR)

    # --- sameipN.no: shared-IP hosts -----------------------------------------
    for n in (1, 2, 3):
        _add_page(web, f"http://sameip{n}.no/felles.html",
                  render_page(rng, f"Felles {n}", no_pars(2), []), HDR)

    # --- redirect.no ----------------------------------------------------------
    web.redirects.append({"url": "http://redirect.no/flyttet.html",
                          "location": "http://a.no/artikkel9.html"})
    web.redirects.append({"url": "http://redirect.no/evig.html",
                          "location": "http://redirect.no/evig.html"})  # self-loop
    _add_page(web, "http://redirect.no/info.html",
              render_page(rng, "Info", no_pars(2), [("evig.html", "rundt og rundt")]), HDR)

    # --- disallowed.no ---------------------------------------------------------
    _add_page(web, "http://disallowed.no/hemmelig.html",
              render_page(rng, "Hemmelig", no_pars(2), []), HDR)

    # --- flytta.no: robots.txt redirects to another host's robots (J3/F14) --
    for i in (1, 2):
        _add_page(web, f"http://flytta.no/side{i}.html",
                  render_page(rng, f"Flytta {i}", no_pars(2),
                              [("side2.html", "neste side her")] if i == 1 else []),
                  HDR)
    # evig-robots.no: robots redirect chain deeper than the 2-redirect cap
    _add_page(web, "http://evigrobots.no/tapt.html",
              render_page(rng, "Tapt", no_pars(2), []), HDR)

    # --- robots bodies ----------------------------------------------------------
    allow_all_hosts = ["seed.no", "a.no", "c.no", "hot.no", "en.example",
                       "redirect.no", "sameip1.no", "sameip2.no", "sameip3.no"]
    for host in allow_all_hosts:
        web.robots.append({"scheme": "http", "host": host, "state": "EMPTY", "body": ""})
    web.robots.append({
        "scheme": "http", "host": "b.no", "state": "FILE",
        "body": "User-agent: *\nDisallow: /privat/\n",
    })
    web.robots.append({
        "scheme": "http", "host": "disallowed.no", "state": "FILE",
        "body": "User-agent: *\nDisallow: /\n",
    })
    web.robots.append({
        "scheme": "http", "host": "delay.no", "state": "FILE",
        "body": "User-agent: *\nCrawl-delay: 100\nDisallow: /ingen/\n",
    })
    # robots redirect targets (crawl.py:394-420, ≤2 redirects)
    web.robots.append({"scheme": "http", "host": "flytta.no", "state": "REDIR",
                       "body": "http://regelvert.no/robots.txt"})
    web.robots.append({"scheme": "http", "host": "regelvert.no", "state": "FILE",
                       "body": "User-agent: *\nDisallow: /side2.html\n"})
    web.robots.append({"scheme": "http", "host": "evigrobots.no", "state": "REDIR",
                       "body": "http://evig2.no/robots.txt"})
    web.robots.append({"scheme": "http", "host": "evig2.no", "state": "REDIR",
                       "body": "http://evig3.no/robots.txt"})
    web.robots.append({"scheme": "http", "host": "evig3.no", "state": "REDIR",
                       "body": "http://evig4.no/robots.txt"})
    web.robots.append({"scheme": "http", "host": "evig4.no", "state": "EMPTY",
                       "body": ""})

    # --- dns --------------------------------------------------------------------
    ip_assign = {
        "seed.no": "10.0.0.1", "a.no": "10.0.0.2", "b.no": "10.0.0.3",
        "c.no": "10.0.0.4", "hot.no": "10.0.0.5", "en.example": "10.0.0.6",
        "redirect.no": "10.0.0.7", "disallowed.no": "10.0.0.8",
        "delay.no": "10.0.0.9", "dead.no": NO_HOST,
        "sameip1.no": "10.0.1.1", "sameip2.no": "10.0.1.1", "sameip3.no": "10.0.1.1",
        "flytta.no": "10.0.2.1", "regelvert.no": "10.0.2.2",
        "evigrobots.no": "10.0.2.3", "evig2.no": "10.0.2.4",
        "evig3.no": "10.0.2.5", "evig4.no": "10.0.2.6",
    }
    for host, ip in ip_assign.items():
        web.dns.append({"scheme": "http", "host": host, "ip": ip})

    # assign warc_ts + wpage placeholder ids in generation order
    for idx, p in enumerate(web.pages):
        p["warc_ts"] = BASE_TS + dt.timedelta(seconds=idx)
        p["ip"] = ip_assign.get(p["url"].split("/")[2], "10.9.9.9")
    return web


def compute_oracle_columns(web: FixtureWeb) -> None:
    """Fill pages' text/lang oracle columns by running the row-level pipeline
    (the byte-identical target, BASELINE.json input_hint)."""
    for idx, p in enumerate(web.pages):
        row = textkit.process_page(
            idx, p["url"], p["html"], p["http_header"],
            p["warc_ts"].strftime("%Y%m%d%H%M%S"), p["ip"],
        )
        p["text"] = row["text"]
        p["lang"] = row["lang"]


def build_queue_web(seed: int = 47) -> FixtureWeb:
    """Fixture web where the O2/O7 queue model BINDS (frontier_queue.py):

    - q.no: one hub page linking 30 paths — with scaled-down test caps
      (max_url_select_per_domain=5, max_host_url_queue=8,
      waiting_rotate_every=2) the per-sweep pull, the queue-cap overflow
      and the waiting rotation all fire on the same code paths the
      reference runs with 20/200
    - late.no: a long path is queued before a shorter path is discovered —
      shows O2 batching (the short path must NOT jump the queue)
    """
    rng = random.Random(seed)
    web = FixtureWeb()

    def no_pars(n):
        return _paragraphs(rng, NO_SENTENCES, n)

    q_paths = ["/sak-%02d-%s.html" % (i, "x" * (i % 5)) for i in range(30)]
    _add_page(
        web, "http://q.no/hub.html",
        render_page(rng, "Køen", no_pars(2),
                    [(p, "sak nummer %d her" % i) for i, p in enumerate(q_paths)]),
        HDR,
    )
    for i, p in enumerate(q_paths):
        _add_page(web, f"http://q.no{p}",
                  render_page(rng, f"Sak {i}", no_pars(2), []), HDR)
    # late.no: the hub queues a short reveal page AND a long blocker page;
    # fetching the reveal page discovers /s.html (shortest) AFTER the
    # blocker is queued — under O2 FIFO the blocker fetches before /s.html
    # (the pre-O2 re-sorting model would fetch /s.html first)
    _add_page(
        web, "http://late.no/hub.html",
        render_page(rng, "Sent", no_pars(2),
                    [("/x1.html", "den avslørende siden"),
                     ("/mellomlang-side-her.html", "den lange siden")]),
        HDR,
    )
    _add_page(
        web, "http://late.no/x1.html",
        render_page(rng, "Avslører", no_pars(2), [("/s.html", "kort sti her")]),
        HDR,
    )
    _add_page(
        web, "http://late.no/mellomlang-side-her.html",
        render_page(rng, "Blokkerer", no_pars(2), []), HDR,
    )
    _add_page(web, "http://late.no/s.html",
              render_page(rng, "Kort", no_pars(2), []), HDR)
    web.seeds = ["http://q.no/hub.html", "http://late.no/hub.html"]
    for host, ip in (("q.no", "10.1.0.1"), ("late.no", "10.1.0.2")):
        web.robots.append({"scheme": "http", "host": host, "state": "EMPTY", "body": ""})
        web.dns.append({"scheme": "http", "host": host, "ip": ip})
    ips = web.dns_map()
    for idx, p in enumerate(web.pages):
        p["warc_ts"] = BASE_TS + dt.timedelta(seconds=idx)
        p["ip"] = ips.get(p["url"].split("/")[2], "10.9.9.9")
    return web


def build_bench_web(
    n_hosts: int = 500, pages_per_host: int = 20, seed: int = 42
) -> FixtureWeb:
    """Wide synthetic web for throughput benches: n_hosts Norwegian hosts,
    pages_per_host pages each, chain + cross links, shared robots/dns.

    Politeness (1 URL/host/round) makes narrow webs scheduler-bound; bench
    webs are wide so every round fetches ~n_hosts pages and the extract
    pipeline dominates — the shape a 10^10-URL frontier actually has.
    No oracle columns (text/lang empty): the bench measures the engine
    recomputing them.
    """
    rng = random.Random(seed)
    web = FixtureWeb()
    hosts = [f"host{i:05d}.no" for i in range(n_hosts)]
    # seed every host's first page directly: the bench measures steady-state
    # wide-frontier rounds, not the fan-out warm-up
    web.seeds = [f"http://{h}/side1.html" for h in hosts]
    for hi, host in enumerate(hosts):
        for p in range(1, pages_per_host + 1):
            links = []
            if p < pages_per_host:
                links.append((f"side{p + 1}.html", "neste side i serien"))
            if p == 1 and hi + 1 < n_hosts:
                links.append((f"http://{hosts[hi + 1]}/side1.html", "naboside"))
            _add_page(
                web, f"http://{host}/side{p}.html",
                render_page(rng, f"{host} side {p}",
                            _paragraphs(rng, NO_SENTENCES, 3), links,
                            nav_links=["/", "/arkiv.html"]),
                HDR,
            )
        web.robots.append({"scheme": "http", "host": host, "state": "EMPTY", "body": ""})
        web.dns.append(
            {"scheme": "http", "host": host, "ip": f"10.2.{hi // 250}.{hi % 250}"}
        )
    for idx, p in enumerate(web.pages):
        p["warc_ts"] = BASE_TS + dt.timedelta(seconds=idx)
        p["ip"] = "10.9.9.9"
        p["text"] = ""
        p["lang"] = ""
    return web


def write_web(out_dir: str, web: FixtureWeb) -> FixtureWeb:
    """Persist a pre-built FixtureWeb (pages may lack oracle columns)."""
    os.makedirs(out_dir, exist_ok=True)
    pages = pa.table(
        {
            "url": [p["url"] for p in web.pages],
            "warc_ts": pa.array([p["warc_ts"] for p in web.pages],
                                type=pa.timestamp("us")),
            "html": pa.array([p["html"] for p in web.pages], type=pa.binary()),
            "text": [p.get("text", "") for p in web.pages],
            "lang": [p.get("lang", "") for p in web.pages],
            "ip": [p["ip"] for p in web.pages],
            "http_header": pa.array([p["http_header"] for p in web.pages],
                                    type=pa.binary()),
        }
    )
    pq.write_table(pages, os.path.join(out_dir, "pages.parquet"))
    pq.write_table(pa.table({k: [r[k] for r in web.robots]
                             for k in ("scheme", "host", "state", "body")}),
                   os.path.join(out_dir, "robots.parquet"))
    pq.write_table(pa.table({k: [r[k] for r in web.dns]
                             for k in ("scheme", "host", "ip")}),
                   os.path.join(out_dir, "dns.parquet"))
    pq.write_table(pa.table({k: [r[k] for r in web.redirects] or pa.array([], type=pa.string())
                             for k in ("url", "location")}),
                   os.path.join(out_dir, "redirects.parquet"))
    with open(os.path.join(out_dir, "seeds.txt"), "w") as f:
        f.write("\n".join(web.seeds) + "\n")
    return web


def write_fixtures(out_dir: str, scale: int = 1, seed: int = 42) -> FixtureWeb:
    """Build + persist the fixture tables as parquet (pages per input_hint)."""
    web = build_web(scale=scale, seed=seed)
    compute_oracle_columns(web)
    return write_web(out_dir, web)
