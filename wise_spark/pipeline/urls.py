"""URL canonicalization and canonical-URL dedup for web-crawl pipelines.

Common-Crawl-scale corpora carry the same page under many surface URLs
(scheme variants, www., default ports, tracking params, fragments, trailing
slashes). Deduping on a CANONICAL KEY collapses those before any content
hashing runs — it is the cheapest dedup family because it needs no text at
all (the reference ingests by filename/url identity, metadata.py:111-256;
this is the web-corpus analog).

Everything here is pure JVM string/regexp expressions (whole-stage codegen,
no Python), and every rule is expressible in ANSI SQL for the DuckDB oracle
(DuckDB regexp_replace needs the 'g' flag where Spark replaces all matches
by default).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# query params that never identify content
TRACKING_PARAM_RE = "(utm_[a-z0-9_]+|fbclid|gclid)"


def canonicalize_url(col: Column | str) -> Column:
    """Canonical DEDUP KEY for a URL (not a display form): the whole string
    is lowercased (hosts/schemes are case-insensitive; treating paths the
    same is the usual crawl-pipeline key convention), then

      1. fragment stripped (#...);
      2. http:// -> https:// (scheme-variant collapse);
      3. tracking query params stripped (utm_*, fbclid, gclid), including
         the separator they ride on — anchored at a real '[?&]' boundary so
         a param merely NAMED like one (e.g. 'xutm_b') is never touched;
         a then-empty '?' is dropped;
      4. a path trailing '/' directly before the query string dropped
         ('/a/?id=1' == '/a?id=1');
      5. default TLS port :443 stripped (before a path, a query, or at end);
      6. leading www. stripped;
      7. one trailing '/' stripped.

    Patterns avoid lookbehind so they run unchanged on Java regex and RE2
    (the DuckDB oracle); only the group-backreference SPELLING differs
    ($1 on Spark, \\1 on DuckDB). Literal ':443/' / ':443?' / '/?' inside a
    query VALUE would be over-collapsed (documented key-convention
    tradeoff — this is a dedup key, not a display form)."""
    u = F.trim(F.lower(F.col(col) if isinstance(col, str) else col))
    u = F.regexp_replace(u, "#.*", "")
    u = F.regexp_replace(u, "^http://", "https://")
    # a run of tracking params followed by a kept param: keep the separator
    u = F.regexp_replace(u, "([?&])(" + TRACKING_PARAM_RE + "=[^&]*&)+", "$1")
    # a trailing run of tracking params: drop separator and run together
    u = F.regexp_replace(
        u,
        "[?&]" + TRACKING_PARAM_RE + "=[^&]*(&" + TRACKING_PARAM_RE + "=[^&]*)*$",
        "",
    )
    u = F.regexp_replace(u, "[?]$", "")
    u = F.replace(u, F.lit("/?"), F.lit("?"))
    u = F.replace(u, F.lit(":443/"), F.lit("/"))
    u = F.replace(u, F.lit(":443?"), F.lit("?"))
    u = F.regexp_replace(u, ":443$", "")
    u = F.regexp_replace(u, "^https://www[.]", "https://")
    u = F.regexp_replace(u, "/$", "")
    return u


def canonicalize_url_duckdb(expr: str) -> str:
    """The DuckDB-SQL mirror of `canonicalize_url`, rule for rule, so ONE
    module owns the canonicalization contract for both engines (the driver
    oracle imports this instead of inlining its own copy). Patterns are
    identical strings; only the backreference rewrite differs (RE2 \\1 vs
    Java $1)."""
    canon = f"lower(trim({expr}))"
    for pat, rep, flag in [
        ("#.*", "", "g"),
        ("^http://", "https://", ""),
        (f"([?&])({TRACKING_PARAM_RE}=[^&]*&)+", r"\1", "g"),
        (f"[?&]{TRACKING_PARAM_RE}=[^&]*(&{TRACKING_PARAM_RE}=[^&]*)*$", "", ""),
        ("[?]$", "", ""),
    ]:
        canon = f"regexp_replace({canon}, '{pat}', '{rep}', '{flag}')"
    for lit, to in [("/?", "?"), (":443/", "/"), (":443?", "?")]:
        canon = f"replace({canon}, '{lit}', '{to}')"
    for pat, rep in [
        (":443$", ""),
        ("^https://www[.]", "https://"),
        ("/$", ""),
    ]:
        canon = f"regexp_replace({canon}, '{pat}', '{rep}', '')"
    return canon


def url_duplicate_groups(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Duplicate groups by canonical URL: (canon_url, n_docs, keeper_doc_id).

    Scale: canonicalization is per-row codegen (zero shuffle); the grouping
    is ONE groupBy keyed by the canonical string — hash-uniform, map-side
    combined, exactly the `exact_duplicates` shape with the md5 replaced by
    the canonical key."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            canonicalize_url(url_col).alias("canon_url"),
        )
        .groupBy("canon_url")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


HOST_RE = "^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"


def extract_host(col: Column | str) -> Column:
    """Lowercased URL host with userinfo ('user:pass@') skipped and any
    leading 'www.' stripped; NULL when the string has no scheme://host
    shape. Pure JVM regexp, Java/RE2-portable (no lookbehind), so the
    DuckDB oracle runs the identical pattern (HOST_RE is the single
    owner). Known simplification: a bracketed IPv6 literal truncates at
    its first ':' — an accepted key-convention tradeoff for crawl-scale
    dedup keys, not a display parser."""
    u = F.lower(F.col(col) if isinstance(col, str) else col)
    h = F.regexp_extract(u, HOST_RE, 1)
    h = F.regexp_replace(h, "^www[.]", "")
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)


def domain_stats(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Per-host corpus profile — the input to domain-level curation
    decisions (C4/Gopher-style domain allow/deny lists, per-domain
    sampling caps): (host, n_docs, n_tokens, avg_doc_tokens,
    n_canonical_urls).

    Scale: host extraction and token counting are per-row codegen (zero
    shuffle), then ONE groupBy on host. count/sum/avg combine map-side;
    a head domain (a wikipedia-sized host in a crawl shard) costs its
    reducer only the pre-combined partials, never a row explosion. The
    distinct-canonical-URL count is Spark's two-phase distinct aggregate —
    the (host, canon_url) shuffle is bounded by the corpus's distinct URL
    count, which dedup upstream already bounds."""
    from .text import _toks

    return (
        docs.select(
            extract_host(url_col).alias("host"),
            F.size(_toks(text_col)).alias("n_toks"),
            canonicalize_url(url_col).alias("canon"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.countDistinct("canon").alias("n_canonical_urls"),
        )
        # mean doc tokens as EXACT integer parts-per-million: float round()
        # of an avg() is a latent cross-engine flake (Spark HALF_UPs the
        # decimal expansion of the binary double, DuckDB rounds the scaled
        # double — a near-.5 7th digit can disagree); integer DIV is
        # bit-identical everywhere. n_tokens*1e6 fits int64 up to ~9e12
        # tokens per host.
        .withColumn(
            "avg_tokens_ppm",
            F.expr("CAST((n_tokens * 1000000) DIV n_docs AS BIGINT)"),
        )
        .select("host", "n_docs", "n_tokens", "avg_tokens_ppm",
                "n_canonical_urls")
    )


def sample_per_domain(
    docs: DataFrame,
    max_per_host: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    n_salts: int = 16,
) -> DataFrame:
    """Deterministic per-host document cap — the curation step that follows
    `domain_stats` (C4-style per-domain sampling: no single host may
    contribute more than max_per_host docs). Keeps the max_per_host
    SMALLEST id_col values per host (stable and re-runnable: the same
    corpus always keeps the same docs), emitting the original columns plus
    (host, rank_in_host).

    Scale: a naive row_number over host routes a wikipedia-sized head
    host's entire row set through ONE reducer. This is two-phase instead:
    a salted local top-N per (host, salt) bounds any reducer at
    ~|host| / n_salts rows and emits <= n_salts * max_per_host survivors
    per host, then the global top-N runs over that bounded relation.
    Same result as the naive window (smallest-N is salt-invariant), shuffle
    bounded on both phases."""
    from pyspark.sql import Window

    base = docs.withColumn("_host", extract_host(url_col)).withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_salts))
    )
    w1 = Window.partitionBy("_host", "_salt").orderBy(id_col)
    w2 = Window.partitionBy("_host").orderBy(id_col)
    return (
        base.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= max_per_host)
        .drop("_rn", "_salt")
        .withColumn("rank_in_host", F.row_number().over(w2))
        .filter(F.col("rank_in_host") <= max_per_host)
        .withColumnRenamed("_host", "host")
    )
