"""Crawl configuration — constants mirrored from the reference's
util/config.py (file:line citations inline).  Only the *semantic* knobs are
kept; file/pipe layout knobs of the reference are irrelevant in the Spark
rebuild (tables replace files).

The reference's soft-real-time loops become logical ROUNDS here: one round is
one HOST_CONN_INTERVAL tick, so per-host politeness = at most one fetch per
host per round (config.py:155-158 of the reference).
"""

from math import log10

# -- URL / host / path checks (reference util/config.py:117, util/http.py:39) --
MAX_HOSTNAME_LEN = 50          # config.py:117
MAX_PATH_LEN = 500             # http.py:39
DOC_SIZE_MIN = 200             # config.py:120
DOC_SIZE_MAX = 10 * 1024 * 1024  # config.py:121

TLD_WHITELIST = ""             # config.py:173 (regexp; '' = no restriction)
TLD_NATIVE = ""                # config.py:177
TLD_BLACKLIST = r"\.tk$"       # config.py:180
DOMAIN_BLACKLIST = frozenset()       # config.py:195 (None by default)
DOMAIN_BLACKLIST_EXACT = frozenset() # config.py:197
DOMAIN_WHITELIST = frozenset()       # config.py:200
# FILE variants (reference config.py:183-204): one entry per line, '#'
# comments; list entries are regex fragments matched at label boundaries
# (http.py:59-69); exact list is literal hostnames.  Lazily compiled in
# urlkit._domain_list_files (cache-clear after changing these).
DOMAIN_BLACKLIST_PATH = None         # config.py:195
DOMAIN_BLACKLIST_EXACT_PATH = None   # config.py:197
DOMAIN_WHITELIST_PATH = None         # config.py:200
EXTRACT_EMPTY_PAGE_INTERNAL_LINKS = True   # config.py:207
EXTRACT_EMPTY_PAGE_EXTERNAL_LINKS = False  # config.py:210
# config.py:350 (binary doc conversion, off by default).  The DRIVER's
# value is the single source of truth: Spark plans capture it at
# plan-build time — URL admission bakes it into a plan literal
# (urlkit.check_url_reason_col) and the extract stage pickles it into the
# UDF closure (operators/extract._make_extract_batches) — so driver and
# executors can never disagree even when executor environments lack the
# variable (ADVICE r3 split-brain).  Set it on the driver via this env
# var, or edit this file like the reference's config.py workflow.
import os as _os

CONVERSION_ENABLED = _os.environ.get("MACOCU_CONVERSION_ENABLED", "") == "1"
SSL_ENABLED = True             # config.py:115 (INFORMATIONAL: fetch is
                               # mocked in-sandbox; the live-fetch UDF
                               # would honour it)

# -- Politeness / scheduling (reference util/config.py) --
IP_CONN_INTERVAL = 1           # config.py:156 [s]
HOST_CONN_INTERVAL = 20        # config.py:158 [s]; == one round
# With one round == HOST_CONN_INTERVAL seconds, a single IP may be contacted
# at most HOST_CONN_INTERVAL / IP_CONN_INTERVAL times per round.
MAX_CONNS_PER_IP_PER_ROUND = HOST_CONN_INTERVAL // IP_CONN_INTERVAL

MAX_URL_SELECT = 30 * 1000     # config.py:98 (non-BIG_CRAWLING)
# O4 cold-start ramp (scheduler.py:156-158): the URL generator emits a batch
# only once ≥ url_batch_size URLs are ready; url_batch_size ramps from
# MIN_URL_SELECT_START to MIN_URL_SELECT over the first ~20 batches
MIN_URL_SELECT_START = 1       # config.py:92 (non-BIG_CRAWLING)
MIN_URL_SELECT = 300           # config.py:93 (non-BIG_CRAWLING)


def increasing_range(start: int, end: int, step_count: int = 10,
                     repeat_start_count: int = 1) -> list[int]:
    """util/__init__.py:342-343, verbatim semantics (guarded: end <
    step_count would make the reference's ``end // step_count`` step 0 and
    raise — clamp to 1 so tiny test CrawlParams ramp in unit steps)."""
    step = max(1, end // step_count)
    return [start] * repeat_start_count + list(range(start, end, step)) + [end]
MAX_URL_SELECT_PER_DOMAIN = 20 # config.py:269
MAX_HOST_URL_QUEUE = 200       # config.py:153
# global downloader-queue bound (crawl.py:117-132, config.py:136: 1M, or 3M
# for BIG_MACHINE+BIG_CRAWLING): when the total queued population exceeds
# this, new sweep/rotation entries go to waiting instead of the queue
MAX_URL_QUEUE = 1_000_000
# reference UPDATE_WAITING_QUEUE_PERIOD (3600 s, config.py:146) expressed in
# rounds of HOST_CONN_INTERVAL (20 s): waiting URLs rotate back into the
# per-host downloader queue every this many rounds
WAITING_ROTATE_ROUNDS = 3600 // HOST_CONN_INTERVAL
MAX_DOMAIN_DISTANCE = 50       # config.py:222
# INFORMATIONAL (not enforced): the reference's per-domain pending-paths
# RAM spill threshold (domain.py:150-167).  The Spark frontier is
# disk-resident, so the spill's purpose (bounding scheduler RAM) does not
# apply; pending order stays (len(path), admission) either way.
MAX_DOMAIN_NEW_PATHS = 100     # config.py:275
# domain sweep priority buckets, disabled by default (config.py:224-233)
DOM_SCHED_HOSTNAME_LEN_RANGES = [MAX_HOSTNAME_LEN]
DOM_SCHED_DOM_DISTANCE_RANGES = [MAX_DOMAIN_DISTANCE]

# INFORMATIONAL (not enforced): general page-redirect hop cap.  In the
# round model each redirect hop consumes its own politeness slot and the
# URL-seen set kills loops, so unbounded chains cannot occur; the robots
# cap (MAX_ROBOT_REDIRECTS) below IS enforced.
MAX_REDIRECTS = 5              # crawl.py redirect handling
MAX_ROBOT_REDIRECTS = 2        # crawl.py:325
IGNORE_ROBOTS_WHEN_FAILED = False  # config.py:279

# -- Yield-driven domain kill rule (reference util/domain.py:228-244) --
MIN_DOCS_DOWNLOADED = 20       # config.py:216 (non-BIG_MACHINE)
MIN_BYTES_DOWNLOADED = 256 * 1024  # config.py:218
# "domain is done" cap (scheduler.py:521): count_cleaned ≥ this → bad;
# None (reference default) disables it — enforced in apply_yield_rule /
# simulator._is_efficient, tested binding in test_crawl_driver
MAX_DOCS_CLEANED = None        # config.py:220


def yield_rate_threshold(doc_count: int) -> float:
    """Permissive threshold: 100 docs: 0.2%, 1000: 0.4%, 10k: 0.6%.

    Reference util/config.py:246-248.
    """
    return 0.002 * (log10(doc_count) - 1)


# SQL fragment of the same rule, used in the domains table update and in the
# DuckDB oracle (operators/domains.py).
YIELD_RATE_THRESHOLD_SQL = "0.002 * (log10({doc_count}) - 1)"

# -- Language / text pipeline (reference util/config.py:288-339) --
LANGUAGES = ("English", "Norwegian")     # config.py:297 (set; ordered here
                                         # for deterministic iteration)
LANGUAGES_ACCEPT = frozenset({"Norwegian"})  # config.py:299
# MULTILINGUAL mode (config.py:61-65, 300-302): multiple languages accepted
# but domains must keep producing PRIMARY_LANGUAGES text — the yield rule
# gains a primary-language ratio threshold (config.py:254-256)
MULTILINGUAL = False
PRIMARY_LANGUAGES = frozenset({"Norwegian"})
PRIMARY_LANG_RATIO_COEFF = 0.05          # config.py:256
LANG_DIFF_THRESHOLD_DOC = 0.6            # config.py:307
LANG_DIFF_THRESHOLD_PAR = 0.95           # config.py:308
FORCE_ENCODING = None                    # config.py:310
# use the chared-equivalent byte-trigram detector (functions/charset.py) in
# the decode ladder when the real chared library is absent — reproduces the
# reference's chared→meta→utf-8 precedence (process.py:170-214)
CHARSET_DETECTOR = True
UNIGRAM_MODELS = False                   # config.py:312 (1-grams for CJK)
SPACE_SEP_TOKENS = True                  # config.py:315

JUSTEXT_LENGTH_LOW = 50                  # config.py:319
JUSTEXT_LENGTH_HIGH = 100                # config.py:321
JUSTEXT_STOPWORDS_LOW = 0.2              # config.py:323
JUSTEXT_STOPWORDS_HIGH = 0.3             # config.py:325
JUSTEXT_MAX_LINK_DENSITY = 0.4           # config.py:327
JUSTEXT_MAX_GOOD_DISTANCE = 5            # config.py:329
JUSTEXT_MAX_HEADING_DISTANCE = 150       # config.py:331
KEEP_BAD_PARAGRAPHS = False              # config.py:336
ALLOW_NEARGOOD_PARAGRAPHS = True         # config.py:339 (not BIG_CRAWLING)

DECODE_IDNA_HOSTNAMES = True             # config.py:286

# Strings indicating machine-translated content (reference process.py:68-70).
MT_STRINGS = (
    "mqtranslate", "wporg-translate", "wp-translate", "qtranslate",
    "wporg-translate-css", "machine-translated-from", "qtranslate-x",
    "delivered by GTranslate", 'name="translation-stats', "data-trp-gettext",
    'id="weglot',
)

AGENT = "macocu-spark"  # config.py:108 (crawler identity for robots UA match)

# -- Spark-side tuning --
SHUFFLE_PARTITIONS = 32
FRONTIER_BUCKETS = 32      # bucket(N, host) partition count for frontier/domains
HOT_HOST_SALT_THRESHOLD = 10_000  # frontier rows per host before salting kicks in
HOT_HOST_SALT_FACTOR = 64  # max shards per hot host (≥ target cluster width
                           # so one host can occupy every executor)
ARROW_MAX_RECORDS_PER_BATCH = 2048
