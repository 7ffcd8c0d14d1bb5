"""Outlink extraction from raw page markup.

Feeds the real host link graph for jobs/linkrank.py (PageRank over
extracted links, the crawl-authority input the derived-graph op in
ops/linkgraph.py models synthetically).  Unlike boilerplate stripping
— whose block semantics are differential-pinned against the stdlib
parser (html/strip.py) — link harvesting needs no parser parity: a
tolerant attribute regex over the markup is the standard corpus-scale
spelling (one pass, no DOM), and hosts come from stdlib urllib
resolution, so results are deterministic.

Per-row Python?  Yes — inside the same Arrow-batched ``pandas_udf``
envelope as the extraction decode itself (spark/udfs.py): markup bytes
cannot be parsed by Catalyst expressions, so this is the sanctioned
slow path, batched and column-pruned (only ``url`` and ``html`` reach
the UDF).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

# href / src attributes in start tags, tolerant of quoting style.
# Applied to markup decoded as latin-1 (lossless byte <-> char).
_HREF_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)


def extract_hrefs(markup: str) -> list[str]:
    """All <a href=...> values, in document order, quotes stripped."""
    out = []
    for m in _HREF_RE.finditer(markup):
        href = m.group(2) or m.group(3) or m.group(4) or ""
        href = href.strip()
        if href and not href.startswith(("#", "javascript:", "mailto:")):
            out.append(href)
    return out


def outlink_hosts(base_url: str, markup: str) -> list[str]:
    """Distinct destination hosts of a page's links (http/https only),
    resolved against the page url; the page's own host is excluded
    (self-loops carry no authority)."""
    try:
        own = urlsplit(base_url).hostname or ""
    except ValueError:
        own = ""
    hosts = set()
    for href in extract_hrefs(markup):
        try:
            parts = urlsplit(urljoin(base_url, href))
        except ValueError:
            continue
        if parts.scheme in ("http", "https") and parts.hostname:
            if parts.hostname != own:
                hosts.add(parts.hostname)
    return sorted(hosts)
