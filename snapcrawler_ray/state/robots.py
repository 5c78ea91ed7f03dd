"""robots.txt rules: parsing + per-host enforcement.

Rebuild of the reference's ``respect_robots_txt`` switch
(config.yaml:132 → settings.py:34 ``ROBOTSTXT_OBEY``, enforced in
scrapy mode by Scrapy's RobotsTxtMiddleware; default **off**, matching
the reference).  Semantics implemented: the RFC 9309 prefix subset —
rules from every ``User-agent: *`` group, longest-match wins, tie goes
to Allow, no rules ⇒ allowed; rules match against path + ``'?' +
query`` (so ``Disallow: /search?q=`` works).  Wildcards (``*``/``$``)
are not supported (documented boundary; the reference's Protego
backend does support them).

Rule state lives WITH the per-host politeness state in the
:class:`~snapcrawler_ray.state.politeness.PolitenessShard` actors —
each host's single owner shard answers both "when may I fetch" and
"may I fetch at all", so at 10^6-host scale no global rules dict ever
assembles on the driver.  A blocked URL is dropped before fetch: it
consumes no politeness budget, produces no visit and no request
(Scrapy ``IgnoreRequest`` behavior).
"""

from __future__ import annotations

import numpy as np

Rule = tuple[bool, str]  # (is_allow, path_prefix)


def parse_robots(body: bytes | str) -> list[Rule]:
    """Rules from every ``User-agent: *`` group, in file order."""
    if isinstance(body, (bytes, bytearray, memoryview)):
        body = bytes(body).decode("utf-8", errors="replace")
    rules: list[Rule] = []
    applies = False
    seen_ua = False  # inside a UA header run (consecutive UA lines)
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not seen_ua:
                # new group header run resets applicability
                applies = False
                seen_ua = True
            if value == "*":
                applies = True
        else:
            seen_ua = False
            if field in ("allow", "disallow") and applies and value:
                rules.append((field == "allow", value))
    return rules


def robots_allowed(rules: list[Rule], paths: np.ndarray) -> np.ndarray:
    """Boolean allow-mask for ``paths`` (object array of URL paths)
    under ``rules``: longest matching prefix decides; tie → Allow;
    no match → allowed."""
    n = len(paths)
    if not rules or n == 0:
        return np.ones(n, dtype=bool)
    best_len = np.zeros(n, dtype=np.int64)
    allowed = np.ones(n, dtype=bool)
    ps = paths.astype(str)
    for is_allow, prefix in rules:
        m = np.char.startswith(ps, prefix)
        plen = len(prefix)
        # longer prefix wins; equal length: Allow beats Disallow
        better = m & (
            (plen > best_len) | ((plen == best_len) & is_allow)
        )
        best_len[better] = plen
        allowed[better] = is_allow
    return allowed


def url_host_path(urls) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (host, match-target) split for http(s) URLs (object
    arrays).  The second element is the robots MATCH TARGET — path
    plus ``'?' + query`` when a query string is present — because RFC
    9309 (and the reference's Protego backend) match rules like
    ``Disallow: /search?q=`` against path+query, not the bare path."""
    import pandas as pd

    s = pd.Series(np.asarray(urls, dtype=object), dtype=object).astype(str)
    rest = s.str.replace(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "", regex=True)
    host = rest.str.split("/", n=1).str[0].str.split(":").str[0].str.lower()
    path = "/" + rest.str.split("/", n=1).str[1].fillna("")
    return host.to_numpy(dtype=object), path.to_numpy(dtype=object)
