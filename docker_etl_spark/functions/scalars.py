"""Scalar function family (SURVEY.md §2.8; routine UDFs §2.9 F1).

Every function returns a Column built from pyspark.sql.functions
built-ins so it stays inside whole-stage codegen — none of these is
a Python UDF. The reference implements these as persistent BigQuery
SQL routines (jobs/webcompat-kb/data/sql/webcompat_knowledge_base/
routines/*/routine.sql); here they are expression macros, which is
also how the reference's UDF-with-subquery problem (F1 rank modifier)
is solved: anything that needs data becomes a join at the operator
layer, not a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# URL / host family
# ---------------------------------------------------------------------------


def url_parse(url: Column | str) -> Column:
    """Parse a URL into struct<protocol, host, path, query, fragment>.

    Reference: URL_PARSE routine (routines/URL_PARSE/routine.sql:1-8,
    regex-based). Spark-first: ``parse_url`` is a built-in JVM
    expression, one call per component.
    """
    u = F.col(url) if isinstance(url, str) else url
    return F.struct(
        F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)).alias("protocol"),
        F.parse_url(u, F.lit("HOST")).alias("host"),
        F.parse_url(u, F.lit("PATH")).alias("path"),
        F.parse_url(u, F.lit("QUERY")).alias("query"),
        F.parse_url(u, F.lit("REF")).alias("fragment"),
    )


def url_host(url: Column | str, strip_www: bool = False) -> Column:
    """Hostname of a URL, optionally stripped of a leading ``www.``.

    Reference: WEBCOMPAT_HOST routine
    (routines/WEBCOMPAT_HOST/routine.sql:1-9 — NET.HOST + conditional
    SUBSTR) and NET.HOST usage in etl/user_reports_aggregate.py:38.
    """
    u = F.col(url) if isinstance(url, str) else url
    host = F.parse_url(u, F.lit("HOST"))
    if strip_www:
        host = F.when(
            host.startswith("www."), host.substr(F.lit(5), F.length(host))
        ).otherwise(host)
    return host


def host_variants(host: Column | str) -> Column:
    """Array of match-key variants {host, www.host, m.host}.

    Reference: host-variant expansion join J13
    (views/webcompat_topline_metric_bug_hosts/view.sql:10-40).
    Returned as an array so the caller explodes it into a join key —
    a union-free formulation of the reference's three-branch UNION.
    """
    h = F.col(host) if isinstance(host, str) else host
    return F.array(h, F.concat(F.lit("www."), h), F.concat(F.lit("m."), h))


def bug_id_from_bugzilla_url(url: Column | str) -> Column:
    """Extract a numeric bug id from a bugzilla show_bug URL.

    Reference: BUG_ID_FROM_BUGZILLA_URL routine
    (routines/BUG_ID_FROM_BUGZILLA_URL/routine.sql:1-12).
    """
    u = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(u, r"show_bug\.cgi\?id=(\d+)", 1).try_cast("bigint")


# ---------------------------------------------------------------------------
# Version / numeric family
# ---------------------------------------------------------------------------


def truncate_version(version: Column | str, part: str = "major") -> Column:
    """``mozfun.norm.truncate_version`` reimplementation (F4).

    Reference usage: graphics summary.sql:23. Returns the numeric
    major (``109``) or major.minor (``109.1``) prefix of a version
    string, NULL when unparseable.
    """
    v = F.col(version) if isinstance(version, str) else version
    pattern = r"^(\d+)" if part == "major" else r"^(\d+\.\d+|\d+)"
    return F.regexp_extract(v, pattern, 1).try_cast("double")


def safe_divide(num: Column, den: Column) -> Column:
    """BigQuery SAFE_DIVIDE (P10): NULL on zero/NULL denominator."""
    return F.try_divide(num, den)


def decimal_money(c: Column | str, precision: int = 12, scale: int = 2) -> Column:
    """Cast a money-like double to an exact decimal.

    Engine policy (SURVEY.md §1.2 NUMERIC semantics): aggregates over
    money columns run in decimal so results are exact and
    reproducible across engines; cast back to double only at the
    output edge.
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({precision},{scale})")


def extract_array(json_str: Column | str) -> Column:
    """EXTRACT_ARRAY routine (F1): JSON array → array of strings,
    scalar fallback to a one-element array.

    Reference: routines/EXTRACT_ARRAY/routine.sql:1-14 (JSON_VALUE_ARRAY
    with fallback-to-scalar coercion).
    """
    c = F.col(json_str) if isinstance(json_str, str) else json_str
    as_array = F.from_json(c, "array<string>")
    # Scalar fallback: JSON_VALUE-style extraction of the root value
    # (from_json cannot take a scalar schema).
    as_scalar = F.get_json_object(c, "$")
    return F.when(c.isNull(), F.lit(None).cast("array<string>")).otherwise(
        F.coalesce(as_array, F.array(as_scalar))
    )


def deterministic_order_key(*cols: Column | str, seed: str = "") -> Column:
    """Random-but-reproducible ordering key (W3).

    Reference: FARM_FINGERPRINT(CONCAT(client_id, seed)) ordering in
    client_regeneration/main.py:80 and graphics_trends.sql:47-48.
    Spark has no FARM_FINGERPRINT; xxhash64 provides the same
    property (deterministic pseudo-random order). Hash VALUES differ
    from the reference — only ordering/bucketing semantics are
    preserved, which is all the reference relies on.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if seed:
        cs = [*cs, F.lit(seed)]
    return F.xxhash64(*cs)


def parse_user_story(col: str) -> Column:
    """``key:value``-line DSL → ``map<string, array<string>>`` (F1).

    Reference: etl/bugzilla.py:407-433 parse_user_story — split
    lines, keep only lines containing ``:``, key = text before the
    FIRST colon (may be empty), value = everything after (may
    contain further colons); repeated keys accumulate values in line
    order. The reference returns ``str | list[str]`` per key; the
    typed engine form is always-an-array, which is the same
    information without the union type.

    Pure JVM expression: one fold over the split lines building the
    map (no Python), as SQL text because the lambda variables must be
    shared between nested HOFs. ``try_element_at`` (not ``acc[key]``)
    because ANSI mode errors on missing map keys.
    """
    if isinstance(col, str):
        ident = "`" + col.replace("`", "``") + "`"
    else:
        # Resolve arbitrary Column expressions through a stable name.
        raise TypeError(
            "parse_user_story takes a column NAME (SQL-text kernel); "
            "alias the expression to a column first"
        )
    key = "substring(l, 1, instr(l, ':') - 1)"
    val = "substr(l, instr(l, ':') + 1)"
    # Outer ifnull: the reference returns {} for None/empty input.
    return F.expr(
        f"""
        ifnull(
          aggregate(
            split({ident}, '\\r\\n|\\r|\\n'),
            cast(map() as map<string,array<string>>),
            (acc, l) ->
              if(instr(l, ':') > 0,
                 map_concat(
                   map_filter(acc, (k, v) -> k != {key}),
                   map({key},
                       array_append(
                         ifnull(try_element_at(acc, {key}),
                                cast(array() as array<string>)),
                         {val}))),
                 acc)),
          cast(map() as map<string,array<string>>))
        """
    )


# ---------------------------------------------------------------------------
# HTML family (S11 in-engine half)
# ---------------------------------------------------------------------------

_HTML_HREF_RE = r"""(?i)href\s*=\s*["']([^"']+)["']"""


def html_links(col: Column | str) -> Column:
    """Extract href targets from markup → array<string>.

    The reference mines links with driver-side BeautifulSoup
    (extensions/main.py:110-133 get_unique_links_from_html); the
    FETCH stays a driver-side adapter (S11, out of engine scope), but
    once pages are a corpus column, link extraction belongs on
    executors: one JVM regexp_extract_all, whole-stage codegen'd —
    no Python, no per-row soup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(_HTML_HREF_RE), 1)


def html_text(col: Column | str) -> Column:
    """Markup → visible text: strip tags, decode the five standard
    entities, collapse whitespace — the engine twin of the
    reference's ``BeautifulSoup(...).get_text()`` +
    ``html.unescape`` (release_scraping/main.py:451-452). Numeric
    character references beyond ``&#39;`` are left as-is (the
    scraped-notes corpus uses the named five); full entity tables
    belong in a Pandas-UDF kernel if ever needed.

    Entity order matters: specific entities decode BEFORE ``&amp;``
    so ``&amp;lt;`` single-decodes to ``&lt;`` (not ``<``)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, F.lit(r"<[^>]*>"), F.lit(" "))
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, F.lit(r"\s+"), F.lit(" ")))


def canonicalize_url(col: Column | str, strip_prefixes: tuple[str, ...] = ("utm_", "fbclid", "gclid")) -> Column:
    """Canonical URL for crawl-level dedup: lowercase scheme+host,
    drop the fragment, drop tracking query parameters (``utm_*`` and
    friends), sort surviving parameters, drop a trailing slash on a
    bare path. Two crawls of the same page with different tracking
    decorations collapse to one key — the standard pre-dedup
    normalization for web corpora (complements ``url_host``/
    ``url_parse``; reference normalizes hosts the same way before
    rank joins, WEBCOMPAT_HOST/routine.sql).

    Pure JVM expressions: split → filter → sort → rejoin; no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    no_frag = F.substring_index(c, "#", 1)
    base = F.substring_index(no_frag, "?", 1)
    query = F.when(
        no_frag.contains("?"), F.substr(no_frag, F.instr(no_frag, "?") + 1)
    ).otherwise(F.lit(""))
    scheme = F.lower(F.substring_index(base, "://", 1))
    rest = F.substring_index(base, "://", -1)
    host = F.lower(F.substring_index(rest, "/", 1))
    path = F.when(
        rest.contains("/"),
        F.concat(F.lit("/"), F.substr(rest, F.instr(rest, "/") + 1)),
    ).otherwise(F.lit(""))
    path = F.when(path == "/", F.lit("")).otherwise(path)

    import functools

    def is_tracking(p: Column) -> Column:
        tests = [
            p.startswith(pre)
            if pre.endswith("_")
            else (F.substring_index(p, "=", 1) == pre)
            for pre in strip_prefixes
        ]
        return functools.reduce(lambda a, b: a | b, tests, F.lit(False))

    params = F.filter(
        F.split(query, "&"), lambda p: (p != "") & ~is_tracking(p)
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(
            F.lit("")
        ),
    )


def zorder_key(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Morton / Z-order interleave of two non-negative ints (low
    ``bits`` of each) — the layout key that makes ONE sort cluster
    TWO dimensions: files written in zorder_key order serve range
    predicates on either column with few-file reads (min/max stats
    prune), the standard multi-dimensional data-layout trick Spark's
    writer lacks natively.

    Pure bit arithmetic (shiftright/&1/shiftleft folds — codegen'd);
    deterministic in any engine. Use as
    ``df.repartitionByRange(n, zorder_key(...)).sortWithinPartitions(...)``
    before the write.
    """
    ca = (F.col(a) if isinstance(a, str) else a).cast("bigint")
    cb = (F.col(b) if isinstance(b, str) else b).cast("bigint")
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out
