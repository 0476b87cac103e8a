"""URL canonicalization — the web-pipeline normalization step a crawl
corpus runs BEFORE URL-level dedup and per-domain capping (CCNet /
C4 build their URL keys this way; the reference has no web handling —
beyond-reference LLM-pipeline coverage, rounds 9-10).

Expression-only (zero UDFs, codegen/JVM end to end) with a
DELIBERATELY pinned rule set so a SQL oracle can replay every step:

0. percent-escape normalization over the whole URL (after the
   fragment drop, BEFORE every other rule, so they all see decoded
   spellings): an escape of an RFC 3986 §2.3 UNRESERVED character
   (ALPHA / DIGIT / ``-`` ``.`` ``_`` ``~``) decodes to the bare
   character (``%7E`` ≡ ``~``); every other VALID escape keeps its
   ``%`` but uppercases the hex digits (``%2f`` ≡ ``%2F``); a ``%``
   not followed by two hex digits is preserved verbatim (malformed
   input stays malformed). Decoding an unreserved character can never
   create a delimiter — ``/ ? # & = : @ %`` are all outside the
   unreserved set — so normalizing first is safe, and the step is a
   fixpoint (decoded output contains ``%`` only in preserved escapes).
1. scheme and host[:port] lowercase (path/query case is preserved —
   it is significant on most servers; USERINFO case is preserved too,
   it is case-sensitive per RFC 3986 — ADVICE r9);
2. the fragment is dropped (`#...` never reaches the server);
3. default ports are stripped (`:80` for http, `:443` for https);
4. tracking query parameters are dropped: any key starting with
   `utm_`, plus `gclid` / `fbclid` / `msclkid` / `ref` exactly;
5. surviving query params are SORTED bytewise (`?b=2&a=1` ≡
   `?a=1&b=2`) and empty params drop (`a=1&&b=2`);
6. dot segments in the path of a scheme-ful URL resolve with RFC 3986
   §5.2.4 stack semantics (`/a/./b` ≡ `/a/b`, `/a/../b` ≡ `/b`;
   `..` at the root is ignored; EMPTY segments — `//` mid-path — are
   ordinary stack entries, so `..` pops them like a browser does).
   Where the RFC would leave a trailing slash (`/a/..` → `/a/`),
   rule 7 strips it, so the composed canonical form is identical.
7. an emptied query drops its `?`; a trailing `/` on a non-root path
   is removed (`http://h/a/` ≡ `http://h/a`; the root `http://h/`
   keeps its slash).

Every split is FIRST-occurrence (`instr` + `substr`), never a
last-occurrence shortcut — a second `?` or `#` belongs to the query/
fragment body, and DuckDB's `strpos`+`substr` replays the identical
semantics. IDN/punycode host folding — gated in rounds 9-11 as "needs
the full nameprep tables" — is now DONE (round 12) via
`fold_idn_hosts`: the tables ship INSIDE the stdlib `encodings.idna`
codec (the html.parser sourcing discipline — no external fixture
needed), as a vectorized Arrow stage since bootstring+nameprep are
genuinely not expressible as SQL expressions. Still NOT done
(documented): `+`-as-space in queries (a form-encoding convention,
not part of the URL itself — decoding it would merge genuinely
distinct keys). Inputs without `://` get steps 0/2/4/5/7 only (no
scheme/authority/path rules to apply).
"""

from __future__ import annotations

import pandas as pd  # top-level: pandas_udf type hints resolve here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query keys dropped by canonical_url_expr (prefix match for utm_)
TRACKING_PARAM_PREFIXES = ("utm_",)
TRACKING_PARAM_KEYS = ("gclid", "fbclid", "msclkid", "ref")

# a path segment that is exactly '.' or '..' (bounded by '/' or ends)
_DOT_SEGMENT_RE = "(^|/)\\.\\.?(/|$)"


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


def pct_normalize_expr(url: Column) -> Column:
    """Rule 0: percent-escape normalization (see module doc). One
    split on '%'; each following piece either decodes (unreserved),
    re-emits '%' + UPPERCASED hex (other valid escapes), or is
    preserved verbatim behind its '%' (malformed). Per-piece work
    reads only the lambda variable — the interpreted-HOF
    re-evaluation gotcha never touches an outer expression here."""
    parts = F.split(url, "%")

    def fix(p: Column) -> Column:
        valid = p.rlike("^[0-9A-Fa-f]{2}")
        hex2 = F.upper(p.substr(F.lit(1), F.lit(2)))
        # conv() only evaluates under the valid branch (CASE WHEN is
        # lazy in both codegen and interpreted eval)
        code = F.when(valid, F.conv(hex2, 16, 10).cast("int"))
        unreserved = (
            ((code >= 48) & (code <= 57))       # DIGIT
            | ((code >= 65) & (code <= 90))     # ALPHA upper
            | ((code >= 97) & (code <= 122))    # ALPHA lower
            | code.isin(45, 46, 95, 126))       # - . _ ~
        rest = p.substr(F.lit(3), F.length(p))
        return (F.when(valid & unreserved, F.concat(F.char(code), rest))
                .when(valid, F.concat(F.lit("%"), hex2, rest))
                .otherwise(F.concat(F.lit("%"), p)))

    tail = F.transform(
        F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))), fix)
    return F.concat(F.get(parts, 0), F.array_join(tail, ""))


def _resolve_dot_segments(path: Column) -> Column:
    """Rule 6: RFC 3986 §5.2.4 remove_dot_segments over a path WITHOUT
    its leading '/': '.' drops, '..' pops (ignored at the root), any
    other segment — including an empty one — pushes. The stack is an
    array-accumulator `aggregate` whose lambda touches only its own
    variables (acc, s), so the interpreted-HOF re-evaluation gotcha
    doesn't bite; paths have few segments, so the O(len) array append
    per step stays trivial. Gated behind a cheap rlike so the vast
    majority of paths (no dot segments) skip the aggregate."""
    segs = F.split(path, "/")
    resolved = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: (
            F.when(s == ".", acc)
            .when(s == "..",
                  F.slice(acc, F.lit(1),
                          F.greatest(F.size(acc) - 1, F.lit(0))))
            .otherwise(F.concat(acc, F.array(s)))))
    return (F.when(path.rlike(_DOT_SEGMENT_RE), F.array_join(resolved, "/"))
            .otherwise(path))


def host_expr(url: Column) -> Column:
    """Lowercased host (no port, no userinfo, no path/query/fragment)
    of a scheme-ful URL; NULL when there is no '://'. Bracketed IPv6
    authorities keep their brackets (`[::1]:80` → `[::1]`) — the
    colon-strip rule only applies OUTSIDE brackets. Percent-escapes
    are NOT decoded here (escaped hosts are outside the pinned rule
    set — pair with `pct_normalize_expr` upstream if needed)."""
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


def _fold_one_idn(u: str) -> str:
    """Rewrite the HOST of one scheme-ful URL to its RFC 3490 ToASCII
    (punycode) form, leaving scheme/userinfo/port/path/query/fragment
    byte-identical. Malformed hosts (a label >63 chars, or non-ASCII yet
    already carrying the xn-- ACE prefix) return the input
    unchanged — malformed stays malformed, the rule-0 discipline."""
    import encodings.idna as _idna

    if "://" not in u:
        return u  # scheme-less: no authority rules (module doc)
    scheme, _, rest = u.partition("://")
    # authority ends at the first of / ? #
    cut = len(rest)
    for ch in "/?#":
        p = rest.find(ch)
        if p != -1:
            cut = min(cut, p)
    auth, tail = rest[:cut], rest[cut:]
    if "@" in auth:
        ui, _, hostport = auth.rpartition("@")
        ui += "@"
    else:
        ui, hostport = "", auth
    if hostport.startswith("["):
        return u  # IPv6 literal: IDNA does not apply
    host, colon, port = hostport.partition(":")
    if host.isascii():
        return u  # the non-ASCII bytes were elsewhere (path, userinfo)
    try:
        host2 = ".".join(
            lb if lb.isascii()
            else _idna.ToASCII(lb).decode("ascii")
            for lb in host.split("."))
    except UnicodeError:
        return u
    return f"{scheme}://{ui}{host2}{colon}{port}{tail}"


def fold_idn_hosts(df: DataFrame, url_col: str,
                   out_col: "str | None" = None) -> DataFrame:
    """IDN host folding (round 12 — closes the r9-r11 documented gate,
    the first gap a multilingual crawl hits): rewrite every
    internationalized hostname to its punycode (RFC 3490 ToASCII,
    IDNA2003) form so `http://bücher.de` and `http://xn--bcher-kva.de`
    get the SAME dedup key. The nameprep tables ship inside the stdlib
    `encodings.idna` codec — the html.parser sourcing discipline, no
    external spec fixture — and nameprep+bootstring are genuinely not
    SQL-expressible, so this is a DataFrame-level Arrow stage (the
    documented escape hatch), not an expression like the rest of this
    module: compose as `fold_idn_hosts(df, col)` on the column that
    feeds `canonical_url_expr` (either order converges — ToASCII
    nameprep-lowercases the label it encodes, canonical rule 1
    lowercases the rest).

    Cost: ONE vectorized pandas_udf pass; the all-ASCII fast path is a
    pandas regex mask INSIDE the udf — a CASE-gated Python UDF would
    be extracted into an unconditional ArrowEvalPython node anyway
    (the extraction gotcha), so the honest design pays one Arrow
    round-trip and near-zero Python per ASCII row. Scheme-less inputs,
    IPv6 literals, and hosts with a label that fails ToASCII (oversize,
    non-ASCII yet already carrying `xn--`) pass through unchanged
    (empty labels are ASCII and pass through label-wise);
    userinfo/port/path bytes are never touched (asserted in tests).
    IDNA2003 semantics pinned (the stdlib codec; IDNA2008 differs on
    ß/ZWJ classes — revisit only if the `idna` package ever lands)."""
    out = out_col or url_col

    @F.pandas_udf("string")
    def _fold(urls: pd.Series) -> pd.Series:
        # na=False keeps the mask a clean bool Series (str.contains
        # propagates NaN for NULL rows otherwise — review r12)
        mask = urls.str.contains("[^\x00-\x7f]", regex=True, na=False)
        res = urls.copy()
        for i in urls.index[mask]:
            res[i] = _fold_one_idn(urls[i])
        return res

    return df.withColumn(out, _fold(F.col(url_col)))


def _bind(expr: Column, f) -> Column:
    """Evaluate `expr` ONCE and hand it to `f` as a lambda variable —
    the one-element transform trick from the interpreted-HOF gotcha.
    A lambda-variable read is O(1); referencing a computed expression
    TEXTUALLY DUPLICATES its tree, so an expression referenced k times
    whose input is referenced k times again grows k² — composing
    canonical_url_expr with itself (the idempotence property) measured
    MINUTES of Catalyst analysis before these bindings and milliseconds
    after (round 10)."""
    return F.get(F.transform(F.array(expr), f), 0)


def canonical_url_expr(url: Column) -> Column:
    """Canonical form of `url` under the module's pinned rule set.

    `url` is referenced exactly ONCE and every multiply-referenced
    intermediate (the escape-normalized string, base, query) is bound
    as a lambda variable via `_bind`, so composing this expression —
    with itself or downstream consumers — grows the tree ADDITIVELY,
    never multiplicatively."""
    u0 = pct_normalize_expr(_before(url, "#"))     # 2 then 0
    return _bind(u0, lambda u: _bind(
        F.struct(_before(u, "?").alias("b"),
                 _after(u, "?").alias("q")),
        lambda s: _canonical_of(s["b"], s["q"])))


def _canonical_of(base: Column, query: Column) -> Column:
    """Rules 1/3-7 over the escape-normalized (base, query) pair; both
    arguments are lambda variables (O(1) reads)."""
    # 1+3. lowercase scheme + host[:port] (userinfo keeps its case —
    # it is case-sensitive per RFC 3986, ADVICE r9), strip the
    # scheme's default port
    scheme = F.lower(_before(base, "://"))
    rest = _after(base, "://")                     # authority[/path...]
    auth_raw = _before(rest, "/")
    hostport = F.substring_index(auth_raw, "@", -1)  # after LAST '@'
    userinfo = auth_raw.substr(                      # incl. its '@'
        F.lit(1), F.length(auth_raw) - F.length(hostport))
    auth = F.concat(userinfo, F.lower(hostport))
    path = F.coalesce(_after(rest, "/"), F.lit(""))  # after FIRST '/'
    auth_n = F.when(
        (scheme == "http") & auth.endswith(":80"),
        auth.substr(F.lit(1), F.length(auth) - 3),
    ).when(
        (scheme == "https") & auth.endswith(":443"),
        auth.substr(F.lit(1), F.length(auth) - 4),
    ).otherwise(auth)
    # 7. trailing slashes on a non-root path drop — ALL of them, not
    # one (review r9: single-strip made 'http://h/a//' canonicalize to
    # 'http://h/a/', which canonicalizes again — not a fixpoint, and
    # the two spellings got different dedup keys). `path` here
    # EXCLUDES the leading '/', so an all-slash path empties and the
    # root collapses to a single '/'; 'http://h///' ≡ 'http://h/'.
    # Dot segments resolve FIRST (rule 6), so 'a/..' empties to the
    # root form and '/a/../' ≡ '/a/..' ≡ '/' (rule 7 absorbs the
    # RFC's would-be trailing slash).
    path_n = F.regexp_replace(_resolve_dot_segments(path), "/+$", "")
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
