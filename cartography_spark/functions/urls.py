"""URL canonicalization — the first stage of every web-scale corpus
pipeline (URL-level dedup precedes content-level dedup in Dolma/
RefinedWeb-style crawl processing: two fetches of the same resource with
cosmetically different URLs must collapse before any text is compared).

All pure ``pyspark.sql.functions`` Column expressions (JVM-side regexp /
string ops, codegen-eligible, no UDFs) so canonicalization runs inside the
scan at 100 TB and the canonical key participates in predicate pushdown
and partition pruning like any other column.

Canonical form applied by :func:`canonicalize_url`:

- scheme and host lowercased; an ``https``-for-``http`` upgrade is NOT
  applied (different resources in general);
- default ports stripped (``:80`` for http, ``:443`` for https);
- fragment (``#...``) removed — never sent to the server;
- tracking query parameters removed (``utm_*``, ``gclid``, ``fbclid``,
  ``ref``), remaining params kept in ORIGINAL order (reordering changes
  semantics for some endpoints; conservative canonicalization only
  removes provably-cosmetic differences);
- empty query (``?`` left over) removed;
- trailing slash dropped from non-root paths; ``//`` collapsed in the
  path; a bare host gets path ``/``.

Reference parity note: cartography has no URL operators (its node ids are
ARNs/URIs used verbatim); this module belongs to the beyond-reference
LLM-data-pipeline requirements.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# anchored at a parameter boundary (start-of-query or &) without lookbehind,
# so the same pattern runs under Java regex (Spark) and RE2 (DuckDB) and
# never fires inside another parameter's name (e.g. href=)
_TRACKING_PARAM = r"(^|&)(utm_[a-z]+|gclid|fbclid|ref)=[^&#]*"


def split_url(url: Column | str) -> dict[str, Column]:
    """Decompose a URL into scheme/host+port/path/query/fragment columns
    (each '' when absent) with one regexp each — no UDF."""
    u = F.col(url) if isinstance(url, str) else url
    return {
        "scheme": F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1),
        "hostport": F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
        "path": F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
        "query": F.regexp_extract(u, r"\?([^#]*)", 1),
        "fragment": F.regexp_extract(u, r"#(.*)$", 1),
    }


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL as one Column expression (see module docstring)."""
    p = split_url(url)
    scheme = F.lower(p["scheme"])
    host = F.lower(p["hostport"])
    # strip the scheme's default port
    host = (
        F.when((scheme == "http") & host.endswith(":80"), host.substr(F.lit(1), F.length(host) - 3))
        .when((scheme == "https") & host.endswith(":443"), host.substr(F.lit(1), F.length(host) - 4))
        .otherwise(host)
    )
    # path: collapse //, drop trailing slash (non-root), default to /
    path = F.regexp_replace(p["path"], r"/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (path != "/") & path.endswith("/"), path.substr(F.lit(1), F.length(path) - 1)
    ).otherwise(path)
    # query: remove tracking params, tidy separators, keep original order
    q = F.regexp_replace(p["query"], _TRACKING_PARAM, "")
    q = F.regexp_replace(q, r"&{2,}", "&")
    q = F.regexp_replace(q, r"^&|&$", "")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


# two-level public suffixes common enough for the heuristic fallback; a
# production deployment swaps in the full Public Suffix List as a broadcast
# lookup — the surrounding expression is unchanged
_TWO_LEVEL_TLDS = (
    "co.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "co.nz", "com.sg", "com.tr",
)


def registrable_domain(host: Column | str) -> Column:
    """Registrable domain (eTLD+1) of a lowercase host: the per-site key
    for domain caps and per-domain quality statistics. Heuristic: last two
    labels, or last three when the last two form a known two-level public
    suffix. IPv4 hosts and ports pass through unchanged."""
    h = F.lower(F.col(host) if isinstance(host, str) else host)
    h = F.regexp_replace(h, r":\d+$", "")  # drop any port
    is_ip = h.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    two_level = last2.isin(*_TWO_LEVEL_TLDS)
    return (
        F.when(is_ip | (n <= 2), h)
        .when(two_level & (n >= 3), last3)
        .otherwise(last2)
    )
