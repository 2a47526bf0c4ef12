"""URL canonicalization, URL-level dedup, and per-domain corpus caps —
the first stages of a web-crawl training-data pipeline (FineWeb/C4-style
URL normalization, dedup-by-URL, and domain balance).

The reference engine has no URL stage (it is a climate-GIS engine); these
operators extend the LLM-data-pipeline axis of the build brief. Everything
is pure Catalyst column expressions built from a dialect-neutral stage
list (`canon_stage_exprs`): the Spark operators `F.expr` each stage and
the DuckDB oracle wraps the SAME strings in staged CTEs, so parity holds
by construction. Constraints that keep the strings dialect-neutral:

* no regexp replacement groups (Spark `$1` vs DuckDB/RE2 `\\1`) — every
  structural edit is CASE + substr/length/instr arithmetic instead;
* tracking params are stripped ONE NAME AT A TIME (`utm_source`,
  `utm_medium`, ...): each name occurs at most once in a well-formed
  query string, so Spark's replace-all and DuckDB's replace-first
  coincide; a malformed query repeating a name is out of contract;
* RE2-compatible patterns only (no lookahead/backrefs), `[.]` instead of
  escaped dots so no backslashes cross the SQL-string boundary.

Canonicalization contract (documented, deliberately simple — the
normalization set FineWeb applies before URL dedup):
fragment dropped; scheme+host lowercased; default ports (:443 https,
:80 http) dropped, other ports kept; leading `www.` dropped; `utm_*`
tracking params dropped (with `?`/`&` re-punctuated); a dangling `?` and
ONE trailing `/` dropped. Out of contract (documented, not detected):
a literal `&` in the PATH is treated as a query separator by the
re-punctuation step; inputs MUST carry a scheme (scheme-less inputs pass
through with `host = domain = ''` — an explicit "unparseable" signal to
filter on); authority userinfo (`user:pass@host`) is not split out
(crawlers drop such URLs upstream).

100-TB posture: `canonicalize` is a narrow per-row projection (0
exchanges, 0 Python — whole-stage codegen end to end); `url_dedup` and
`domain_cap` each cost exactly one hash-partition window shuffle on the
canonical key — the same shape as exact text dedup (`dedup.exact_dedup`),
and skew-safe because hosts are hashed, not ranged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ocgis_spark.operators.sampling import HASH_MOD, HASH_MULT

#: Multi-part public suffixes recognized by `registered domain` extraction
#: (a deliberately small, documented subset of the public-suffix list —
#: the full PSL would ship as a broadcast dim table at production scale).
MULTI_PART_SUFFIXES = (
    "ac.uk", "co.in", "co.jp", "co.kr", "co.nz", "co.uk", "co.za",
    "com.au", "com.br", "com.cn", "com.mx", "com.tr", "gov.uk",
    "net.au", "org.au", "org.uk",
)

#: Tracking-parameter names stripped by canonicalization (each stripped
#: individually; see module docstring for why that keeps dialect parity).
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
)


def canon_stage_exprs(url: str = "url") -> list[tuple[str, str]]:
    """The canonicalization pipeline as ordered (column, SQL-expression)
    stages. Later stages reference earlier stage columns by name, so the
    list maps 1:1 onto `withColumn` chains (Spark) and staged CTEs
    (DuckDB oracle)."""
    utm = "substr(_u0, length(_shp) + 1)"
    for p in TRACKING_PARAMS:
        utm = f"regexp_replace({utm}, '[?&]{p}=[^&]*', '')"
    suffixes = ", ".join(f"'{s}'" for s in MULTI_PART_SUFFIXES)
    return [
        # drop the fragment
        ("_u0", f"regexp_replace({url}, '#.*', '')"),
        # scheme://host[:port], lowercased (length unchanged by lower())
        ("_shp", "lower(regexp_extract(_u0, '^[a-zA-Z]+://[^/?]*', 0))"),
        # drop default ports
        ("_sh", "CASE WHEN _shp LIKE 'https://%:443' "
                "THEN substr(_shp, 1, length(_shp) - 4) "
                "WHEN _shp LIKE 'http://%:80' "
                "THEN substr(_shp, 1, length(_shp) - 3) ELSE _shp END"),
        # drop a leading www.
        ("_sh2", "CASE WHEN _sh LIKE 'https://www.%' "
                 "THEN concat('https://', substr(_sh, 13)) "
                 "WHEN _sh LIKE 'http://www.%' "
                 "THEN concat('http://', substr(_sh, 12)) ELSE _sh END"),
        # path+query with tracking params stripped (one name at a time)
        ("_r1", utm),
        # if stripping removed the leading '?', promote the first '&'
        ("_r2", "CASE WHEN instr(_r1, '?') = 0 AND instr(_r1, '&') > 0 "
                "THEN concat(substr(_r1, 1, instr(_r1, '&') - 1), '?', "
                "substr(_r1, instr(_r1, '&') + 1)) ELSE _r1 END"),
        # drop a dangling '?' (query became empty)
        ("_r3", "CASE WHEN _r2 LIKE '%?' "
                "THEN substr(_r2, 1, length(_r2) - 1) ELSE _r2 END"),
        # drop one trailing '/'
        ("_r4", "CASE WHEN _r3 LIKE '%/' "
                "THEN substr(_r3, 1, length(_r3) - 1) ELSE _r3 END"),
        ("canon_url", "concat(_sh2, _r4)"),
        # host = authority minus scheme and minus any (non-default) port
        ("_h0", "substr(_sh2, instr(_sh2, '://') + 3)"),
        ("host", "CASE WHEN instr(_h0, ':') > 0 "
                 "THEN substr(_h0, 1, instr(_h0, ':') - 1) ELSE _h0 END"),
        ("_l2", "regexp_extract(host, '[^.]+[.][^.]+$', 0)"),
        ("_l3", "regexp_extract(host, '[^.]+[.][^.]+[.][^.]+$', 0)"),
        ("domain", f"CASE WHEN _l2 = '' THEN host "
                   f"WHEN _l2 IN ({suffixes}) AND _l3 <> '' THEN _l3 "
                   f"ELSE _l2 END"),
    ]


_INTERMEDIATE = tuple(
    name for name, _ in canon_stage_exprs() if name.startswith("_")
)


def canonicalize(df: DataFrame, url: str = "url") -> DataFrame:
    """Add `canon_url`, `host`, `domain` columns. Pure narrow projection:
    0 exchanges, 0 Python (plan-asserted in tests/test_urls.py).

    r6, Spark side only (the oracle keeps :func:`canon_stage_exprs`'s
    self-contained strings byte-identical): the fragment regex and the
    five tracking-param regexes are gated behind ``instr`` containment
    checks, so a row pays a regex invocation only for markers it
    actually contains. Equality is universal, not corpus-dependent: no
    '#' means the fragment pattern cannot match, and a UTM deletion
    span always extends to the next '&' or end-of-string, so a
    deletion can never splice a tracking-name literal into existence —
    ``instr(_u0, name) = 0`` implies no stage of the chain can match
    that name (gated == ungated pytest in tests/test_urls.py)."""
    utm_base = "substr(_u0, length(_shp) + 1)"
    gated: list[tuple[str, str]] = []
    for name, expr in canon_stage_exprs(url):
        if name == "_u0":
            expr = (
                f"CASE WHEN instr({url}, '#') > 0 THEN {expr} "
                f"ELSE {url} END"
            )
            gated.append((name, expr))
        elif name == "_r1":
            # unroll the shared 5-regex chain into per-name gated
            # stages (linear expression size; one codegen projection)
            prev = "_g0"
            gated.append(("_g0", utm_base))
            for i, p in enumerate(TRACKING_PARAMS):
                nm = f"_g{i + 1}"
                gated.append((nm, (
                    f"CASE WHEN instr(_u0, '{p}') > 0 THEN "
                    f"regexp_replace({prev}, '[?&]{p}=[^&]*', '') "
                    f"ELSE {prev} END"
                )))
                prev = nm
            gated.append((name, prev))
        elif name == "_l3":
            # _l3 is consumed only when _l2 is a multi-part suffix
            # (domain's CASE) — skip its regex otherwise
            sfx = ", ".join(f"'{s}'" for s in MULTI_PART_SUFFIXES)
            gated.append((name, (
                f"CASE WHEN _l2 IN ({sfx}) THEN {expr} ELSE '' END"
            )))
        else:
            gated.append((name, expr))
    for name, expr in gated:
        df = df.withColumn(name, F.expr(expr))
    return df.drop(
        *_INTERMEDIATE, *(f"_g{i}" for i in range(len(TRACKING_PARAMS) + 1))
    )


def url_dedup(
    df: DataFrame, url: str = "url", key: str = "doc_id"
) -> DataFrame:
    """Keep ONE document per canonical URL (the lowest key — "first
    crawl wins"). One window shuffle on the canonical URL."""
    out = canonicalize(df, url)
    w = Window.partitionBy("canon_url").orderBy(F.col(key).asc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def domain_cap(
    df: DataFrame, cap: int, domain: str = "domain", key: str = "doc_id"
) -> DataFrame:
    """Keep at most `cap` documents per registered domain, chosen
    deterministically (multiplicative-hash order, key tiebreak — the
    same partitioning-independent rule as sampling.hash_bucket, so the
    kept set is stable across engines and reruns). One window shuffle
    on the domain."""
    hash_order = ((F.col(key).cast("bigint") * F.lit(HASH_MULT))
                  % F.lit(HASH_MOD))
    w = Window.partitionBy(domain).orderBy(hash_order.asc(),
                                           F.col(key).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


# ---------------------------------------------------------------- oracle


def canon_cte_sql(base: str, url: str = "url") -> str:
    """Wrap a base relation in the staged canonicalization CTEs; yields a
    relation named `_canon` with all stage columns attached. `base` is any
    SQL relation expression (table name or parenthesized subquery)."""
    stages = canon_stage_exprs(url)
    sql = f"_c0 AS (SELECT * FROM {base})"
    prev = "_c0"
    for i, (name, expr) in enumerate(stages, 1):
        sql += f", _c{i} AS (SELECT *, {expr} AS {name} FROM {prev})"
        prev = f"_c{i}"
    sql += f", _canon AS (SELECT * FROM {prev})"
    return sql


def url_synth_sql(key: str = "doc_id") -> str:
    """Deterministic messy-URL synthesis from a non-negative integer key
    (tests/bench only — no external data, per the build brief). Exercises
    every canonicalization rule: mixed-case scheme/host, www, default +
    non-default ports, multi-part suffixes, utm params in both positions,
    all-tracking queries (dangling '?'), trailing slash, fragments."""
    k = f"({key} % 60)"
    return (
        "concat("
        f"CASE WHEN {k} % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END, "
        f"CASE WHEN {k} % 3 = 0 THEN 'WWW.' ELSE '' END, "
        f"'Host', CAST({k} % 7 AS STRING), "
        f"'.Ex', CAST({k} % 4 AS STRING), "
        f"CASE WHEN {k} % 5 = 0 THEN '.CO.UK' ELSE '.COM' END, "
        f"CASE WHEN {k} % 4 = 0 THEN "
        f"(CASE WHEN {k} % 2 = 0 THEN ':443' ELSE ':80' END) "
        f"ELSE '' END, "
        f"'/p/', CAST({k} % 6 AS STRING), "
        f"CASE WHEN {k} % 10 = 9 THEN '/' "
        f"WHEN {k} % 10 = 3 THEN '?utm_campaign=z' "
        f"WHEN {k} % 2 = 0 THEN concat('/?utm_source=news&id=', "
        f"CAST({k} % 3 AS STRING)) "
        f"ELSE concat('?id=', CAST({k} % 3 AS STRING), "
        f"'&utm_medium=mail') END, "
        f"CASE WHEN {k} % 7 = 0 THEN '#frag' ELSE '' END)"
    )


def url_canon_sql(table: str = "documents", key: str = "doc_id") -> str:
    base = (f"(SELECT {key}, {url_synth_sql(key)} AS url FROM {table})"
            .replace("STRING", "VARCHAR"))
    return (
        f"WITH {canon_cte_sql(base)} "
        f"SELECT {key}, canon_url, host, domain FROM _canon"
    )


def url_dedup_sql(table: str = "documents", key: str = "doc_id") -> str:
    base = (f"(SELECT {key}, {url_synth_sql(key)} AS url FROM {table})"
            .replace("STRING", "VARCHAR"))
    return (
        f"WITH {canon_cte_sql(base)}, _rn AS ("
        f"SELECT {key}, canon_url, ROW_NUMBER() OVER ("
        f"PARTITION BY canon_url ORDER BY {key} ASC) AS rn FROM _canon) "
        f"SELECT {key}, canon_url FROM _rn WHERE rn = 1"
    )


def domain_caps_sql(
    table: str = "documents", key: str = "doc_id", cap: int = 8
) -> str:
    base = (f"(SELECT {key}, {url_synth_sql(key)} AS url FROM {table})"
            .replace("STRING", "VARCHAR"))
    return (
        f"WITH {canon_cte_sql(base)}, _rn AS ("
        f"SELECT {key}, domain, ROW_NUMBER() OVER (PARTITION BY domain "
        f"ORDER BY ({key} * {HASH_MULT}) % {HASH_MOD} ASC, {key} ASC"
        f") AS rn FROM _canon) "
        f"SELECT {key}, domain FROM _rn WHERE rn <= {cap}"
    )
