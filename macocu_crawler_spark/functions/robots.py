"""robots.txt parsing and matching, from scratch.

Reproduces the semantics the reference gets from its vendored
robotexclusionrulesparser (util/robotparser.py):

- rulesets grouped by User-agent blocks; UA match is case-insensitive
  substring, '*' matches all; non-default rulesets are consulted before the
  '*' ruleset; FIRST matching ruleset decides (robotparser.py:199-207)
- within a ruleset, first matching rule wins; GYM2008 wildcards '*' and '$'
  (robotparser.py:162-176); %-unquoting of paths except %2F
  (robotparser.py:93-99)
- the empty-Disallow negation quirk: a blank rule path negates the rule's
  effect (robotparser.py:183-186)
- Crawl-delay per ruleset (robotparser.py:300-309); the *reference ignores*
  crawl delays larger than HOST_CONN_INTERVAL with only a warning
  (domain.py:109-111) — we record it and do the same

The reference swaps in re2 because hostile rules like ``Allow: /*****.js$``
explode Python's backtracking engine (robotparser.py:63-74).  re2 is not
available here, so wildcard runs are collapsed before compilation
(``**`` ≡ ``*``), which removes the pathological case while matching the
same language.

Rulesets are serialised to/from a compact string so the ``robots`` table can
store parsed rules as a plain column (SURVEY.md §2.2 F5/U10).
"""

from __future__ import annotations

import re
from urllib.parse import unquote as _unquote
from urllib.parse import urlparse, urlunparse

_EOL_RE = re.compile(r"(?:\r\n)|\r|\n")
_DIRECTIVE_RE = re.compile(
    r"(allow|disallow|user[-]?agent|sitemap|crawl-delay):[ \t]*(.*)", re.I
)
_CTRL_RE = re.compile("[\000-\037\177]")
_WILDCARD_RUN_RE = re.compile(r"\*{2,}")

ALLOW, DISALLOW = 1, 2


def _unquote_path(path: str) -> str:
    if "%" in path:
        return _unquote(path.replace("%2f", "\n").replace("%2F", "\n")).replace("\n", "%2F")
    return path


def _scrub(data: str) -> str:
    return _CTRL_RE.sub("", data).replace("\t", " ").strip()


class Ruleset:
    __slots__ = ("agents", "rules", "crawl_delay")

    def __init__(self) -> None:
        self.agents: list[str] = []
        self.rules: list[tuple[int, str]] = []
        self.crawl_delay: float | None = None

    def matches_agent(self, user_agent: str) -> bool:
        ua = user_agent.lower()
        return any(a == "*" or a.lower() in ua for a in self.agents)

    def is_default(self) -> bool:
        return "*" in self.agents

    def allows(self, url: str) -> bool:
        _, _, path, params, query, frag = urlparse(url)
        url_path = _unquote_path(urlunparse(("", "", path, params, query, frag)))
        for rule_type, rule_path in self.rules:
            if "*" in rule_path or rule_path.endswith("$"):
                # GYM2008 wildcard syntax
                anchored = rule_path.endswith("$")
                body = rule_path[:-1] if anchored else rule_path
                body = _WILDCARD_RUN_RE.sub("*", body)
                pattern = ".*".join(re.escape(part) for part in body.split("*"))
                if anchored:
                    pattern += "$"
                if re.match(pattern, url_path):
                    return rule_type == ALLOW
            elif url_path.startswith(rule_path):
                allowed = rule_type == ALLOW
                if not rule_path:  # blank path negates (robotparser.py:183-186)
                    allowed = not allowed
                return allowed
        return True


class RobotsRules:
    __slots__ = ("rulesets",)

    def __init__(self, rulesets: list[Ruleset] | None = None) -> None:
        self.rulesets = rulesets or []

    def is_allowed(self, user_agent: str, url: str) -> bool:
        for ruleset in self.rulesets:
            if ruleset.matches_agent(user_agent):
                return ruleset.allows(url)
        return True

    def get_crawl_delay(self, user_agent: str) -> float | None:
        for ruleset in self.rulesets:
            if ruleset.matches_agent(user_agent):
                return ruleset.crawl_delay
        return None


def parse(body: str) -> RobotsRules:
    """Parse robots.txt text into RobotsRules (robotparser.py:218-328)."""
    rulesets: list[Ruleset] = []
    current: Ruleset | None = None
    prev_was_agent = False
    for line in _EOL_RE.sub("\n", body).split("\n"):
        line = line.strip()
        if line.startswith("#"):
            continue
        hash_pos = line.find("#")
        if hash_pos != -1:
            line = line[:hash_pos].strip()
        if not line:
            if current and current.rules and current.agents:
                rulesets.append(current)
            current = None
            prev_was_agent = False
            continue
        m = _DIRECTIVE_RE.findall(line)
        if not m:
            continue
        field, data = m[0]
        field = field.lower()
        data = _scrub(data)
        if field in ("useragent", "user-agent"):
            if prev_was_agent:
                if current and data:
                    current.agents.append(data)
            else:
                if current and current.rules and current.agents:
                    rulesets.append(current)
                current = Ruleset()
                if data:
                    current.agents.append(data)
            prev_was_agent = True
        elif field == "allow":
            prev_was_agent = False
            if current:
                current.rules.append((ALLOW, _unquote_path(data)))
        elif field == "sitemap":
            prev_was_agent = False
        elif field == "crawl-delay":
            prev_was_agent = False
            if current:
                try:
                    current.crawl_delay = float(data)
                except ValueError:
                    pass
        else:  # disallow
            prev_was_agent = False
            if current:
                current.rules.append((DISALLOW, _unquote_path(data)))
    if current and current.rules and current.agents:
        rulesets.append(current)
    # default ('*') rulesets go last so they apply only as fallback
    return RobotsRules(
        [r for r in rulesets if not r.is_default()] + [r for r in rulesets if r.is_default()]
    )


def parse_and_get_crawl_delay(body: str, agent: str) -> tuple[RobotsRules, float | None]:
    """domain.py:324-330."""
    rules = parse(body)
    return rules, rules.get_crawl_delay(agent)
