"""Reference-semantics crawl simulator (pure Python, no Spark).

This is the crawl-ordering + URL-seen oracle of SURVEY.md §5.3: it executes
the reference scheduler's semantics (scheduler.py / domain.py / crawl.py of
/root/reference) on the fixture web, under the explicit ROUND model both
this simulator and the Spark driver implement:

- one round == one HOST_CONN_INTERVAL tick; each eligible domain fetches at
  most ONE URL per round (politeness, config.py:155-158), at most
  ``ip_cap`` domains per IP per round (IP_CONN_INTERVAL grouping)
- a domain's first fetch is /robots.txt (domain.py:173-175); robots arrive
  at the end of the same round
- per-domain URL order: (len(path), admission order) — domain.py:155 — is
  the PENDING order; each round one sweep moves ≤ max_url_select_per_domain
  pending paths into the per-host downloader QUEUE (O2, scheduler.py:126-128),
  enqueueing while the queue holds ≤ max_host_url_queue entries and sending
  overflow to a per-host waiting FIFO (O7, crawl.py:134-141); waiting URLs
  rotate back into the queue every waiting_rotate_every rounds
  (crawl.py:160-217); while the TOTAL queued population exceeds
  max_url_queue (crawl.py:117-132, evaluated once per sweep/rotation like
  the reference's per-batch q_urls_full), every sweep/rotation entry goes
  to waiting regardless of per-host headroom, and bad domains never rotate
  (crawl.py:169).  Fetches take the queue head (FIFO) — so a shorter
  path admitted later does NOT jump ahead of already-queued paths, exactly
  as in the reference.  (The reference's under-politeness-contention
  requeue-to-back churn is poll-timing-dependent and is replaced by the
  stable per-host FIFO, as is the global byte-chunked waiting-file rotation,
  which is per-host FIFO-equivalent.)
- domain sweep order: (hostname-length bucket, distance bucket, host,
  scheme) — scheduler.py:110-140; dict-order nondeterminism of the
  reference is replaced by the host/scheme tie-break, which is the total
  order the north rule needs for cross-parallelism determinism
- link admission at end of round: distance = min-combine(src+1)
  (scheduler.py:365-401); URL-seen insert-or-skip on the sanitised path
  *before* the robots check (domain.py:136-150 adds the hash first)
- links are only extracted from pages that yielded accepted-language text
  (process.py:607-624)
- dedup first-wins in wpage_id order: txt then raw (scheduler.py:304-318);
  duplicates still update domain counters (scheduler.py:319-329)
- yield rule evaluated per round once past min docs/bytes
  (domain.py:228-244); counters only accumulate from pages with accepted
  text (process.py:641 sends len(html_text) which is '' otherwise)
- robots redirects (crawl.py:394-420, 503-552): a robots fetch answered
  with a redirect enqueues a robots-redirect fetch of the target URL,
  charged to the TARGET host's politeness slot, fetched with top priority
  (the reference appendlefts it); the fetched body applies to the SOURCE
  domain; more than MAX_ROBOT_REDIRECTS (2) hops → robots FAIL for the
  source.  Targets are answered from the robots table by (scheme, host).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from math import log10

from . import config
from .fixtures import NO_HOST, FixtureWeb
from .functions import robots as robotskit
from .functions import textkit, urlkit

ROBOT_PATH = urlkit.ROBOT_PATH


@dataclass
class CrawlParams:
    max_rounds: int = 30
    max_url_select: int = config.MAX_URL_SELECT
    ip_cap: int = config.MAX_CONNS_PER_IP_PER_ROUND
    # O2: ≤ this many paths move pending→downloader-queue per domain per
    # sweep (reference scheduler.py:126-128, MAX_URL_SELECT_PER_DOMAIN)
    max_url_select_per_domain: int = config.MAX_URL_SELECT_PER_DOMAIN
    # O7: per-host downloader-queue cap; overflow → waiting
    # (reference crawl.py:134-141)
    max_host_url_queue: int = config.MAX_HOST_URL_QUEUE
    # global downloader-queue bound (crawl.py:117-132): q_urls_full is
    # evaluated ONCE per update batch — here once per sweep/rotation — and
    # while it holds, every entry goes to waiting regardless of host headroom
    max_url_queue: int = config.MAX_URL_QUEUE
    # waiting URLs rotate back every this many rounds (crawl.py:160-217,
    # UPDATE_WAITING_QUEUE_PERIOD in rounds)
    waiting_rotate_every: int = config.WAITING_ROTATE_ROUNDS
    # O4 cold-start ramp (scheduler.py:156-188): a round only FETCHES when
    # ≥ batch_min(batches_emitted) candidates are selected; the minimum
    # ramps MIN_URL_SELECT_START → MIN_URL_SELECT over ~20 emitted batches.
    # Defaults (1, 1) never gate — fixture webs are far below the
    # reference's production minimum (300); set reference-like values to
    # exercise the gate.
    min_url_select_start: int = 1
    min_url_select: int = 1
    # MULTILINGUAL mode (domain.py:239-243, config.py:254-256): domains must
    # keep bytes_cleaned_primary / bytes_cleaned above the ratio threshold
    multilingual: bool = config.MULTILINGUAL
    primary_languages: tuple = tuple(sorted(config.PRIMARY_LANGUAGES))
    primary_coeff: float = config.PRIMARY_LANG_RATIO_COEFF
    min_docs_downloaded: int = config.MIN_DOCS_DOWNLOADED
    min_bytes_downloaded: int = config.MIN_BYTES_DOWNLOADED
    # "domain is done" cap (scheduler.py:521); None disables
    max_docs_cleaned: int | None = config.MAX_DOCS_CLEANED
    yield_coeff: float = 0.002          # config.py:246-248
    max_domain_distance: int = config.MAX_DOMAIN_DISTANCE
    hostname_len_ranges: tuple = tuple(config.DOM_SCHED_HOSTNAME_LEN_RANGES)
    distance_ranges: tuple = tuple(config.DOM_SCHED_DOM_DISTANCE_RANGES)
    agent: str = config.AGENT
    # Spark-side knob (ignored by the simulator — semantics are identical):
    # route URL-seen membership through the partitioned Bloom pre-filter
    use_bloom_prefilter: bool = False
    # 'vectorized' (driver numpy over collected probe hashes) or
    # 'distributed' (executor-side delta bitsets, driver ORs <=n_buckets
    # rows) — the scale path for very wide rounds; semantics identical
    bloom_increment_mode: str = "vectorized"
    # which prefilter family use_bloom_prefilter enables: 'bloom'
    # (12 bits/key, OR-mergeable deltas) or 'cuckoo' (~20 bits/key at
    # load 0.8, ~25x lower FP rate, DELETABLE — urlseen.CuckooState).
    # Either way the exact anti-join stays authoritative; semantics
    # identical (tested equivalent)
    seen_prefilter: str = "bloom"
    # Spark-side knob: keep the compacted url_seen as a BUCKETED table on
    # the seen key so the exact anti-join never reshuffles the seen side
    # (operators/urlseen.write_bucketed_seen); deltas between compactions
    # stay small broadcastable legs.  Semantics identical to the plain
    # union anti-join (chained anti-joins; tested equivalent)
    use_bucketed_seen: bool = False

    def yield_threshold(self, doc_count: int) -> float:
        return self.yield_coeff * (log10(doc_count) - 1)

    def primary_threshold(self, doc_count: int) -> float:
        return self.primary_coeff * (log10(doc_count) - 1)

    def batch_min(self, batches_emitted: int) -> int:
        """Minimum batch size for the next batch after `batches_emitted`
        emitted ones.  Reference: url_batch_size starts at
        MIN_URL_SELECT_START and is re-popped from the reversed
        increasing_range after every emitted batch (scheduler.py:156-188)."""
        if self.min_url_select <= self.min_url_select_start:
            return self.min_url_select_start
        if batches_emitted == 0:
            return self.min_url_select_start
        asc = config.increasing_range(
            self.min_url_select_start, self.min_url_select,
            step_count=10, repeat_start_count=10,
        )
        return asc[min(batches_emitted - 1, len(asc) - 1)]

    def bucket_key(self, host: str, distance: int) -> tuple[int, int]:
        hb = next((i for i, t in enumerate(self.hostname_len_ranges) if len(host) <= t),
                  len(self.hostname_len_ranges))
        db = next((i for i, t in enumerate(self.distance_ranges) if distance <= t),
                  len(self.distance_ranges))
        return hb, db


@dataclass
class SimDomain:
    scheme: str
    host: str
    ip: str | None = None
    distance: int = 0
    bad: bool = False
    robot_state: str = "none"  # none | init | ready | fail | empty
    rules: robotskit.RobotsRules | None = None
    pending: list[tuple[str, int, int]] = field(default_factory=list)  # (path, batch, seq)
    # O2/O7 downloader-queue model (crawl.py q_urls + urls_waiting):
    # queue: FIFO of paths pulled from pending (≤ max_url_select_per_domain
    # per sweep); waiting: per-host FIFO of cap-overflow paths
    queue: list[str] = field(default_factory=list)
    waiting: list[str] = field(default_factory=list)
    count_downloaded: int = 0
    count_cleaned: int = 0
    bytes_downloaded: int = 0
    bytes_cleaned: int = 0
    bytes_cleaned_primary: int = 0  # MULTILINGUAL only (domain.py:43-61)

    def robot_allowed(self, agent: str, path: str) -> bool:
        if self.robot_state == "ready":
            return self.rules.is_allowed(agent, path)
        if self.robot_state == "empty":
            return True
        if self.robot_state == "fail":
            return config.IGNORE_ROBOTS_WHEN_FAILED
        return False  # none/init: undecided (callers treat as allowed-to-queue)


@dataclass
class SimResult:
    fetch_log: list[tuple[int, int, str]] = field(default_factory=list)
    url_seen: set[tuple[str, str, str]] = field(default_factory=set)
    documents: list[dict] = field(default_factory=list)
    duplicate_ids: list[int] = field(default_factory=list)
    ignored: list[tuple[str, str, str, str]] = field(default_factory=list)
    domains: dict = field(default_factory=dict)
    metrics: list[dict] = field(default_factory=list)


class CrawlSimulator:
    def __init__(self, web: FixtureWeb, params: CrawlParams | None = None) -> None:
        self.web = web
        self.params = params or CrawlParams()
        self.pages = web.page_map()
        self.robots = web.robots_map()
        self.dns = web.dns_map()
        self.redirects = web.redirect_map()
        self.domains: dict[tuple[str, str], SimDomain] = {}
        self.robot_redirects: list[dict] = []
        self.url_seen: set[tuple[str, str, str]] = set()
        self.txt_seen: dict[str, int] = {}
        self.raw_seen: dict[str, int] = {}
        self.result = SimResult(url_seen=self.url_seen, domains=self.domains)
        self.wpage_counter = 0
        self.seq_counter = 0
        self.batches_emitted = 0  # O4 cold-start ramp position

    # -- admission (scheduler.py:358-441) ------------------------------------
    def admit_links(self, round_no: int, links: list[tuple]) -> None:
        """links: ordered (src_scheme, src_host, scheme, host, path) tuples."""
        seen_tuples = set()
        dom_distances: dict[tuple[str, str], int] = {}
        target_paths: dict[tuple[str, str], list[str]] = {}
        for src_scheme, src_host, scheme, host, path in links:
            tup = (src_scheme, src_host, scheme, host, path)
            if tup in seen_tuples:
                continue
            seen_tuples.add(tup)
            key, src_key = (scheme, host), (src_scheme, src_host)
            if src_scheme is None and src_host is None:
                target_distance = 0
            else:
                src = self.domains.get(src_key)
                src_distance = dom_distances.get(src_key, src.distance if src else 0)
                target_distance = src_distance + 1
            cur = dom_distances.get(key)
            if cur is None or target_distance < cur:
                dom_distances[key] = target_distance
            if dom_distances[key] <= self.params.max_domain_distance:
                target_paths.setdefault(key, []).append(path)
        for key, paths in target_paths.items():
            scheme, host = key
            dom = self.domains.get(key)
            if dom is None:
                dom = SimDomain(scheme, host, distance=dom_distances[key])
                self.domains[key] = dom
                self._add_new_paths(dom, paths + ["/"], round_no)
                ip = self.dns.get(host, NO_HOST)
                if ip in (NO_HOST, None):
                    dom.bad = True
                else:
                    dom.ip = ip
            else:
                dom.distance = min(dom.distance, dom_distances[key])
                self._add_new_paths(dom, paths, round_no)

    def _add_new_paths(self, dom: SimDomain, paths: list[str], round_no: int) -> None:
        """domain.py:136-167: URL-seen insert before robots check, then
        stable sort by path length."""
        for path in paths:
            sanitised = urlkit.sanitise_path(path)
            key = (dom.scheme, dom.host, sanitised)
            if key in self.url_seen:
                continue
            self.url_seen.add(key)
            if dom.robot_state in ("none", "init") or dom.robot_allowed(
                self.params.agent, path
            ):
                dom.pending.append((path, round_no, self.seq_counter))
                self.seq_counter += 1
        dom.pending.sort(key=lambda t: len(t[0]))  # stable: (len, insertion)

    # -- robots arrival (domain.py:92-121) ------------------------------------
    def _apply_robots(self, dom: SimDomain, state: str, body: str) -> None:
        if state == "EMPTY" or (state == "FILE" and not body.strip()):
            dom.robot_state = "empty"
        elif state == "FAIL":
            dom.robot_state = "fail"
            if not config.IGNORE_ROBOTS_WHEN_FAILED:
                dom.bad = True
        else:
            try:
                dom.rules, _delay = robotskit.parse_and_get_crawl_delay(
                    body, self.params.agent
                )
                dom.robot_state = "ready"
                dom.pending = [
                    p for p in dom.pending
                    if dom.rules.is_allowed(self.params.agent, p[0])
                ]
            except Exception:
                dom.robot_state = "fail"
                if not config.IGNORE_ROBOTS_WHEN_FAILED:
                    dom.bad = True

    def _handle_robots_fetch(
        self, dom: SimDomain, target_scheme: str, target_host: str, redir_count: int
    ) -> None:
        """A robots fetch (own or redirect-target) resolved against the
        robots table; REDIR chains (crawl.py:394-420, cap 2)."""
        entry = self.robots.get((target_scheme, target_host))
        state = entry["state"] if entry else "EMPTY"
        body = entry["body"] if entry else ""
        if state != "REDIR":
            self._apply_robots(dom, state, body)
            return
        if redir_count >= config.MAX_ROBOT_REDIRECTS:
            self._apply_robots(dom, "FAIL", "")
            return
        try:
            scheme, host, path = urlkit.url_split(body)
        except ValueError:
            scheme = None
        if scheme not in ("http", "https"):
            self._apply_robots(dom, "FAIL", "")
            return
        ip = self.dns.get(host, NO_HOST)
        if ip in (NO_HOST, None):
            self._apply_robots(dom, "FAIL", "")
            return
        self.robot_redirects.append(
            {
                "src": (dom.scheme, dom.host), "scheme": scheme, "host": host,
                "path": path, "ip": ip, "count": redir_count + 1,
                "seq": self.seq_counter,
            }
        )
        self.seq_counter += 1

    # -- yield rule (domain.py:228-244) ---------------------------------------
    def _is_efficient(self, dom: SimDomain) -> bool:
        if (
            dom.bytes_downloaded < self.params.min_bytes_downloaded
            or dom.count_downloaded < self.params.min_docs_downloaded
        ):
            return True
        threshold = self.params.yield_threshold(dom.count_downloaded)
        if dom.bytes_downloaded and dom.bytes_cleaned / dom.bytes_downloaded < threshold:
            dom.bad = True
            return False
        # MULTILINGUAL primary-language ratio (domain.py:239-243); guarded
        # for bytes_cleaned == 0 (reachable only with sub-reference minimum
        # params, where the reference itself would divide by zero)
        if self.params.multilingual and dom.bytes_cleaned:
            if (
                dom.bytes_cleaned_primary / dom.bytes_cleaned
                < self.params.primary_threshold(dom.count_downloaded)
            ):
                dom.bad = True
                return False
        return True

    # -- waiting rotation + sweep (O2/O7) ---------------------------------------
    def _rotate_waiting(self) -> None:
        """crawl.py:160-217 update_url_queue, per-host form: move waiting
        URLs (FIFO) back into the downloader queue up to the cap headroom.
        The reference's global byte-chunked file rotation is a RAM bound,
        not an ordering device — per host the FIFO order is identical."""
        cap = self.params.max_host_url_queue
        if self._queued_total() > self.params.max_url_queue:
            return  # globally full: nothing rotates in (crawl.py:118,136-140)
        for key in sorted(self.domains, key=lambda k: (k[1], k[0])):
            dom = self.domains[key]
            if dom.bad or not dom.waiting:
                continue
            headroom = cap + 1 - len(dom.queue)  # enqueue allowed while len<=cap
            while headroom > 0 and dom.waiting:
                dom.queue.append(dom.waiting.pop(0))
                headroom -= 1

    def _queued_total(self) -> int:
        return sum(len(d.queue) for d in self.domains.values())

    def _sweep(self) -> None:
        """scheduler.py:126-128 + domain.py:169-209: each ready domain moves
        ≤ max_url_select_per_domain paths pending→queue per sweep (one sweep
        per round); crawl.py:134-141 cap check per entry — overflow goes to
        the per-host waiting FIFO, NOT back to pending."""
        cap = self.params.max_host_url_queue
        k = self.params.max_url_select_per_domain
        # global bound, evaluated once per sweep like the reference's
        # per-batch q_urls_full (crawl.py:118)
        q_full = self._queued_total() > self.params.max_url_queue
        for key in sorted(self.domains, key=lambda k_: (k_[1], k_[0])):
            dom = self.domains[key]
            if dom.bad or dom.ip is None or dom.robot_state not in ("ready", "empty"):
                continue
            pulled, dom.pending = dom.pending[:k], dom.pending[k:]
            for path, _batch, _seq in pulled:
                if not q_full and len(dom.queue) <= cap:
                    dom.queue.append(path)
                else:
                    dom.waiting.append(path)

    # -- one round --------------------------------------------------------------
    def run_round(self, round_no: int) -> int:
        # evaluate efficiency + done-cap (update_domains, scheduler.py:503-526)
        for dom in self.domains.values():
            if not dom.bad:
                if (
                    self._is_efficient(dom)
                    and self.params.max_docs_cleaned
                    and dom.count_cleaned >= self.params.max_docs_cleaned
                ):
                    dom.bad = True  # scheduler.py:521 "domain is done"
        # O7 waiting rotation, then the O2 sweep (rotation first: the sweep's
        # cap check sees the post-rotation queue)
        if (
            self.params.waiting_rotate_every
            and round_no % self.params.waiting_rotate_every == 0
        ):
            self._rotate_waiting()
        self._sweep()
        # select: robots-redirect fetches first (appendleft priority,
        # crawl.py:413-415), then one URL per eligible domain, ordered
        occupied: set[tuple[str, str]] = set()
        ip_counts: dict[str, int] = {}
        selected: list[tuple] = []
        picked_rr: list[dict] = []
        # one pending entry per target host (earliest seq), swept in bucket
        # order (mirrors the Spark window + ordering exactly)
        rr_by_host: dict[tuple[str, str], dict] = {}
        for entry in sorted(self.robot_redirects, key=lambda e: e["seq"]):
            rr_by_host.setdefault((entry["scheme"], entry["host"]), entry)
        for entry in sorted(
            rr_by_host.values(),
            key=lambda e: (self.params.bucket_key(e["host"], 0), e["host"], e["scheme"]),
        ):
            key = (entry["scheme"], entry["host"])
            if key in occupied or len(selected) >= self.params.max_url_select:
                continue
            if ip_counts.get(entry["ip"], 0) >= self.params.ip_cap:
                continue
            occupied.add(key)
            ip_counts[entry["ip"]] = ip_counts.get(entry["ip"], 0) + 1
            selected.append(("rr", entry))
            picked_rr.append(entry)
        candidates = []
        for key in sorted(self.domains, key=lambda k: (k[1], k[0])):
            dom = self.domains[key]
            if dom.bad or dom.ip is None:
                continue
            if dom.robot_state == "none":
                candidates.append((dom, ROBOT_PATH, True))
            elif dom.robot_state in ("ready", "empty") and dom.queue:
                candidates.append((dom, dom.queue[0], False))
        candidates.sort(
            key=lambda c: (
                self.params.bucket_key(c[0].host, c[0].distance),
                c[0].host,
                c[0].scheme,
            )
        )
        for dom, path, is_robot in candidates:
            key = (dom.scheme, dom.host)
            if key in occupied or len(selected) >= self.params.max_url_select:
                continue
            n = ip_counts.get(dom.ip, 0)
            if n >= self.params.ip_cap:
                continue
            occupied.add(key)
            ip_counts[dom.ip] = n + 1
            selected.append(("dom", dom, path, is_robot))
        # O4 cold-start gate (scheduler.py:134-140, 177-188): too few
        # candidates for the current minimum batch size → the scheduler
        # would keep waiting; in the round model nothing new can arrive
        # without fetches, so the crawl ends here
        if selected and len(selected) < self.params.batch_min(self.batches_emitted):
            self.result.metrics.append(
                {"round": round_no, "selected": 0, "processed": 0, "gated": len(selected)}
            )
            return 0
        self.batches_emitted += 1
        for entry in picked_rr:
            self.robot_redirects.remove(entry)
        # fetch + process in order
        new_links: list[tuple] = []
        processed = 0
        for seq, item in enumerate(selected):
            if item[0] == "rr":
                entry = item[1]
                url = urlkit.url_join(entry["scheme"], entry["host"], entry["path"])
                self.result.fetch_log.append((round_no, seq, url))
                src_dom = self.domains[entry["src"]]
                self._handle_robots_fetch(
                    src_dom, entry["scheme"], entry["host"], entry["count"]
                )
                continue
            _, dom, path, is_robot = item
            url = urlkit.url_join(dom.scheme, dom.host, path)
            self.result.fetch_log.append((round_no, seq, url))
            if is_robot:
                dom.robot_state = "init"
                self._handle_robots_fetch(dom, dom.scheme, dom.host, 0)
                continue
            dom.queue.pop(0)
            if url in self.redirects:
                redir_url = self.redirects[url]
                parts, reason = urlkit.url_split_and_check_parts(redir_url, dom.host)
                if parts:
                    new_links.append((dom.scheme, dom.host) + parts)
                else:
                    self.result.ignored.append((dom.scheme, dom.host, reason, redir_url))
                continue
            page = self.pages.get(url)
            if page is None:
                continue  # 404: slot consumed, nothing recorded
            body = page["html"]
            if len(body) < config.DOC_SIZE_MIN or len(body) > config.DOC_SIZE_MAX:
                continue  # http.py:414-447 size gates
            wpage_id = self.wpage_counter
            self.wpage_counter += 1
            row = textkit.process_page(
                wpage_id, url, body, page["http_header"],
                page["warc_ts"].strftime("%Y%m%d%H%M%S"), dom.ip,
            )
            processed += 1
            # dedup (scheduler.py:304-318): txt hash first, then raw hash
            if row["txt_len"]:
                txt_key, raw_key = row["txt_hash"], row["html_hash"]
                if txt_key in self.txt_seen:
                    self.result.duplicate_ids.append(wpage_id)
                elif raw_key in self.raw_seen:
                    self.txt_seen[txt_key] = wpage_id
                    self.result.duplicate_ids.append(wpage_id)
                else:
                    self.txt_seen[txt_key] = wpage_id
                    self.raw_seen[raw_key] = wpage_id
            # counters (scheduler.py:319-329): raw_len = len(decoded html) of
            # accepted pages, 0 otherwise
            if row["raw_len"]:
                dom.count_downloaded += 1
                dom.bytes_downloaded += row["raw_len"]
                if row["txt_len"]:
                    dom.count_cleaned += 1
                    dom.bytes_cleaned += row["txt_len"]
                    if (
                        self.params.multilingual
                        and row["lang"] in self.params.primary_languages
                    ):
                        dom.bytes_cleaned_primary += row["txt_len"]
            self.result.documents.append(row)
            for reason, bad_url in row["ignored_links"]:
                self.result.ignored.append((dom.scheme, dom.host, reason, bad_url))
            for link in row["links"]:
                new_links.append((dom.scheme, dom.host) + link)
        self.admit_links(round_no + 1, new_links)
        self.result.metrics.append(
            {"round": round_no, "selected": len(selected), "processed": processed}
        )
        return len(selected)

    def run(self, seeds: list[str] | None = None) -> SimResult:
        seeds = seeds if seeds is not None else self.web.seeds
        seed_links = []
        for line in seeds:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if "://" not in line:
                line = f"http://{line}"  # scheduler.py:699-705 bare-host seeds
            parts, reason = urlkit.url_split_and_check_parts(line)
            if parts:
                seed_links.append((None, None) + parts)
            else:
                self.result.ignored.append((None, None, reason, line))
        self.admit_links(0, seed_links)
        for round_no in range(1, self.params.max_rounds + 1):
            if self.run_round(round_no) == 0:
                break
        return self.result
