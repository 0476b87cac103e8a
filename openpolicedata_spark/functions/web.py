"""URL canonicalization — the web-pipeline normalization step a crawl
corpus runs BEFORE URL-level dedup and per-domain capping (CCNet /
C4 build their URL keys this way; the reference has no web handling —
beyond-reference LLM-pipeline coverage, round 9).

Expression-only (zero UDFs, codegen end to end) with a DELIBERATELY
pinned rule set so a SQL oracle can replay every step:

1. scheme and authority lowercase (path/query case is preserved — it
   is significant on most servers);
2. the fragment is dropped (`#...` never reaches the server);
3. default ports are stripped (`:80` for http, `:443` for https);
4. tracking query parameters are dropped: any key starting with
   `utm_`, plus `gclid` / `fbclid` / `msclkid` / `ref` exactly;
5. surviving query params are SORTED bytewise (`?b=2&a=1` ≡
   `?a=1&b=2`) and empty params drop (`a=1&&b=2`);
6. an emptied query drops its `?`; a trailing `/` on a non-root path
   is removed (`http://h/a/` ≡ `http://h/a`; the root `http://h/`
   keeps its slash).

Every split is FIRST-occurrence (`instr` + `substr`), never a
last-occurrence shortcut — a second `?` or `#` belongs to the query/
fragment body, and DuckDB's `strpos`+`substr` replays the identical
semantics. NOT done (documented, same discipline as the codec
gates): percent-escape normalization (`%7E` vs `~` needs the full
RFC 3986 unreserved table), IDN/punycode, and path dot-segment
resolution (`/a/../b`) — each needs state a string expression
shouldn't fake. Inputs without `://` get steps 2/4/5/6 only (no
scheme/authority rules to apply).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# query keys dropped by canonical_url_expr (prefix match for utm_)
TRACKING_PARAM_PREFIXES = ("utm_",)
TRACKING_PARAM_KEYS = ("gclid", "fbclid", "msclkid", "ref")


def _before(col: Column, sep: str) -> Column:
    """Text before the FIRST `sep` (whole string when absent)."""
    p = F.instr(col, sep)
    return F.when(p > 0, col.substr(F.lit(1), p - 1)).otherwise(col)


def _after(col: Column, sep: str) -> Column:
    """Text after the FIRST `sep` (NULL when absent)."""
    p = F.instr(col, sep)
    return F.when(p > 0, col.substr(p + F.lit(len(sep)), F.length(col)))


def _is_tracking(p: Column) -> Column:
    key = _before(p, "=")
    cond = F.lit(False)
    for pre in TRACKING_PARAM_PREFIXES:
        cond = cond | key.startswith(pre)
    for k in TRACKING_PARAM_KEYS:
        cond = cond | (key == k)
    return cond


def host_expr(url: Column) -> Column:
    """Lowercased host (no port, no userinfo, no path/query/fragment)
    of a scheme-ful URL; NULL when there is no '://'. Bracketed IPv6
    authorities keep their brackets (`[::1]:80` → `[::1]`) — the
    colon-strip rule only applies OUTSIDE brackets."""
    rest = _after(_before(_before(url, "#"), "?"), "://")
    auth = F.substring_index(_before(rest, "/"), "@", -1)
    bracket_end = F.instr(auth, "]")
    # an unterminated '[' yields NULL, not '' (review r9: '' would
    # silently bucket every bracket-malformed URL under one empty
    # domain; NULL keeps the unparseable-input signal)
    host = F.when(auth.startswith("["),
                  F.when(bracket_end > 0,
                         auth.substr(F.lit(1), bracket_end))) \
        .otherwise(_before(auth, ":"))
    return F.lower(host)


def canonical_url_expr(url: Column) -> Column:
    """Canonical form of `url` under the module's pinned rule set."""
    u = _before(url, "#")                          # 2. drop fragment
    base = _before(u, "?")
    query = _after(u, "?")                         # NULL when no query

    # 1+3. lowercase scheme+authority, strip the scheme's default port
    scheme = F.lower(_before(base, "://"))
    rest = _after(base, "://")                     # authority[/path...]
    auth = F.lower(_before(rest, "/"))
    path = F.coalesce(_after(rest, "/"), F.lit(""))  # after FIRST '/'
    auth_n = F.when(
        (scheme == "http") & auth.endswith(":80"),
        auth.substr(F.lit(1), F.length(auth) - 3),
    ).when(
        (scheme == "https") & auth.endswith(":443"),
        auth.substr(F.lit(1), F.length(auth) - 4),
    ).otherwise(auth)
    # 6. trailing slashes on a non-root path drop — ALL of them, not
    # one (review r9: single-strip made 'http://h/a//' canonicalize to
    # 'http://h/a/', which canonicalizes again — not a fixpoint, and
    # the two spellings got different dedup keys). `path` here
    # EXCLUDES the leading '/', so an all-slash path empties and the
    # root collapses to a single '/'; 'http://h///' ≡ 'http://h/'.
    path_n = F.regexp_replace(path, "/+$", "")
    base_n = F.when(
        base.contains("://"),
        F.concat(scheme, F.lit("://"), auth_n,
                 F.when(rest.contains("/"), F.concat(F.lit("/"), path_n))
                 .otherwise(F.lit(""))),
    ).otherwise(
        # no scheme: only the trailing-slash rule applies; an ALL-slash
        # base ('/', '//') stays as-is (nothing non-slash to anchor to)
        F.when(base.rlike("^/*$"), base)
        .otherwise(F.regexp_replace(base, "/+$", ""))
    )

    # 4+5. drop tracking + empties, sort bytewise, rejoin
    params = F.filter(F.split(query, "&"),
                      lambda p: (p != "") & ~_is_tracking(p))
    params_s = F.array_join(F.sort_array(params), "&")
    q_suffix = F.when(query.isNotNull() & (params_s != ""),
                      F.concat(F.lit("?"), params_s)).otherwise(F.lit(""))
    return F.concat(base_n, q_suffix)
