"""URL parsing / normalization column expressions — the web-curation
stage in front of every crawl-derived corpus: dedup and per-domain
policy (caps, blocklists, quality priors) all key on a CANONICAL url,
and two crawls of the same page routinely differ only by tracking
params, default ports, host case, or a fragment. (The reference's
only URL work is request building, ref: operators/api_to_s3.py:55-61;
its clickstream carries raw ``url`` strings nobody canonicalizes.)

All pure ``pyspark.sql.functions`` compositions over the RFC 3986
Appendix-B decomposition regex — JVM-side, codegen'd, no Python —
and every rule is expressible verbatim in ANSI SQL so oracles can
replay normalization symbolically.

Normalization rules (the conservative, public-knowledge set used by
crawl dedup; each is a visible, documented choice):
- scheme and host lowercased
- default ports stripped (``:80`` for http, ``:443`` for https)
- fragment dropped (never reaches the server)
- tracking params dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``), remaining params SORTED for order-insensitivity
- empty path becomes ``/``

``registered_domain`` is a heuristic (last two labels, three under a
small embedded set of common two-level public suffixes), NOT a full
Public Suffix List — the PSL is a living database; embed it when the
deployment can ship data files.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: RFC 3986 Appendix B — the spec's own decomposition regex (group
#: numbers per the RFC: 2=scheme, 4=authority, 5=path, 7=query,
#: 9=fragment).
RFC3986 = r"^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?"

#: Query params that identify the CLICK, not the page. Public
#: tracking-param vocabulary (Google/Facebook/Microsoft ads).
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid")

#: Common two-level public suffixes for the registered-domain
#: heuristic (a pragmatic subset, documented as such above).
TWO_LEVEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "co.za", "com.sg", "com.tr", "com.ar",
)


def url_scheme(url: Column | str) -> Column:
    return F.lower(F.regexp_extract(url, RFC3986, 2))


def url_authority(url: Column | str) -> Column:
    """host[:port] exactly as written (case preserved) — feed
    :func:`url_host` / :func:`url_port` for the pieces."""
    return F.regexp_extract(url, RFC3986, 4)


def url_host(url: Column | str) -> Column:
    """Lowercased host without port or userinfo."""
    auth = url_authority(url)
    no_user = F.element_at(F.split(auth, "@"), -1)
    return F.lower(F.element_at(F.split(no_user, ":"), 1))


def url_port(url: Column | str) -> Column:
    """Explicit port as a string, '' when absent."""
    auth = url_authority(url)
    no_user = F.element_at(F.split(auth, "@"), -1)
    return F.when(
        no_user.contains(":"), F.element_at(F.split(no_user, ":"), -1)
    ).otherwise(F.lit(""))


def url_path(url: Column | str) -> Column:
    return F.regexp_extract(url, RFC3986, 5)


def url_query(url: Column | str) -> Column:
    return F.regexp_extract(url, RFC3986, 7)


def clean_query(url: Column | str) -> Column:
    """Query string with tracking params dropped and the rest sorted;
    '' when nothing survives."""
    q = url_query(url)
    parts = F.split(q, "&")
    kept = F.filter(
        parts,
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~F.element_at(F.split(p, "="), 1).isin(*TRACKING_PARAMS),
    )
    return F.array_join(F.array_sort(kept), "&")


def normalize_url(url: Column | str) -> Column:
    """Canonical URL per the module's documented rule set."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = url_path(url)
    q = clean_query(url)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def registered_domain(host: Column) -> Column:
    """Heuristic eTLD+1: last 2 labels, or last 3 when the last 2 form
    a known two-level suffix (see ``TWO_LEVEL_SUFFIXES`` caveat)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    is_two_level = last2.isin(*TWO_LEVEL_SUFFIXES)
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return (
        F.when(n <= 2, host)
        .when(is_two_level & (n >= 3), last3)
        .otherwise(last2)
    )
