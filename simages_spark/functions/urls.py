"""URL canonicalization + revisit dedup — the crawl-identity tier.

The reference's item identity is the filesystem path, normalized by the
OS (src/simages/duplicate_finder.py:113 uses the absolute path as the
Mongo `_id`). For Common-Crawl-style pages (BASELINE.json input_hint:
`url` is the identity column) the analog problem is messier: the same
page is fetched under syntactic URL variants (scheme/host case, default
ports, tracking params, fragment, trailing slash, query-param order) and
across crawls (revisits). A web-scale pipeline canonicalizes BEFORE any
content dedup — it is the cheapest tier (pure string algebra, no join
against content) and it collapses the biggest bulk duplicate source.

Canonicalization spec (applied identically by `normalize_url_col`, the
JVM fast path, and `duckdb_normalize_url_sql`, the oracle mirror — both
generated against this docstring so they cannot drift):

  1. trim; a value without '://' passes through unchanged (opaque —
     surfaced, not guessed);
  2. drop the fragment (everything from the first '#');
  3. split off the query at the first '?';
  4. lowercase scheme and authority (host[:port], userinfo included);
  5. drop the scheme's default port (:80 for http, :443 for https);
  6. strip trailing '/'-runs from the path; an empty path becomes '/';
  7. query: split on '&', drop empty params and tracking params (key
     starts with 'utm_', or key ∈ {gclid, fbclid, msclkid}), sort the
     rest bytewise, re-join with '&'; an emptied query disappears.

Scale posture: normalization is a pure per-row map (whole-stage codegen,
zero shuffles, no Python); revisit dedup is ONE groupBy on the
normalized key electing max(struct(warc_ts, url)) with map-side partial
aggregation — the full-row payload never rides the election shuffle, it
is re-attached by an equi-join on the elected key (AQE-splittable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TRACKING_KEYS = ("gclid", "fbclid", "msclkid")


def _split_first(s: Column, sep: str, limit: int = 2) -> Column:
    return F.split(s, sep, limit)


def normalize_url_col(url: Column) -> Column:
    """Canonical URL per the module spec. Pure JVM column algebra."""
    s = F.trim(url)
    # 2. fragment off (regex-quoted separators; '?' is a regex metachar)
    base = _split_first(s, "#").getItem(0)
    # 3. query off
    pre = _split_first(base, r"\?").getItem(0)
    # "first '?' wins": everything after the FIRST '?' is the query,
    # even if it contains further '?' characters
    q = F.when(
        F.instr(base, "?") > 0,
        F.substring(base, F.instr(base, "?") + 1, F.length(base)),
    ).otherwise(F.lit(""))
    # 4./5. scheme + authority + path
    scheme = F.lower(_split_first(pre, "://").getItem(0))
    rest = F.when(
        F.instr(pre, "://") > 0,
        F.substring(pre, F.instr(pre, "://") + 3, F.length(pre)),
    ).otherwise(F.lit(""))
    slash = F.instr(rest, "/")
    authority = F.lower(
        F.when(slash > 0, F.substring(rest, F.lit(1), slash - 1)).otherwise(rest)
    )
    path = F.when(
        slash > 0, F.substring(rest, slash, F.length(rest))
    ).otherwise(F.lit(""))
    authority = F.when(
        (scheme == "http") & authority.endswith(":80"),
        authority.substr(F.lit(1), F.length(authority) - 3),
    ).when(
        (scheme == "https") & authority.endswith(":443"),
        authority.substr(F.lit(1), F.length(authority) - 4),
    ).otherwise(authority)
    # 6. path
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # 7. query params
    key_of = lambda t: _split_first(t, "=").getItem(0)  # noqa: E731
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda t: (t != "")
            & ~(F.substring(key_of(t), 1, 4) == "utm_")
            & ~key_of(t).isin(*TRACKING_KEYS),
        )
    )
    qn = F.array_join(kept, "&")
    normalized = F.concat(
        scheme,
        F.lit("://"),
        authority,
        path,
        F.when(qn != "", F.concat(F.lit("?"), qn)).otherwise(F.lit("")),
    )
    # 1. opaque passthrough
    return F.when(F.instr(s, "://") > 0, normalized).otherwise(s)


def duckdb_normalize_url_sql(expr: str) -> str:
    """DuckDB mirror of `normalize_url_col` (same spec, same steps)."""
    tracking = ", ".join(f"'{k}'" for k in TRACKING_KEYS)
    return f"""
      CASE WHEN strpos(trim({expr}), '://') = 0 THEN trim({expr}) ELSE (
        WITH_INLINE
      ) END
    """.replace(
        "WITH_INLINE",
        f"""
        SELECT lower(string_split(pre, '://')[1]) || '://' ||
          CASE
            WHEN lower(string_split(pre, '://')[1]) = 'http'
                 AND ends_with(auth, ':80')
              THEN auth[1:len(auth)-3]
            WHEN lower(string_split(pre, '://')[1]) = 'https'
                 AND ends_with(auth, ':443')
              THEN auth[1:len(auth)-4]
            ELSE auth
          END ||
          CASE WHEN regexp_replace(path, '/+$', '') = '' THEN '/'
               ELSE regexp_replace(path, '/+$', '') END ||
          CASE WHEN qn = '' THEN '' ELSE '?' || qn END
        FROM (
          SELECT pre, rest, path,
            lower(CASE WHEN strpos(rest, '/') > 0
                       THEN rest[1:strpos(rest, '/')-1] ELSE rest END) AS auth,
            coalesce(array_to_string(list_sort(list_filter(
              string_split(q, '&'),
              t -> t != ''
                   AND NOT starts_with(string_split(t, '=')[1], 'utm_')
                   AND string_split(t, '=')[1] NOT IN ({tracking})
            )), '&'), '') AS qn
          FROM (
            SELECT pre,
              CASE WHEN strpos(pre, '://') > 0
                   THEN pre[strpos(pre, '://')+3:] ELSE '' END AS rest,
              CASE WHEN strpos(pre, '://') > 0
                    AND strpos(pre[strpos(pre, '://')+3:], '/') > 0
                   THEN (pre[strpos(pre, '://')+3:])
                          [strpos(pre[strpos(pre, '://')+3:], '/'):]
                   ELSE '' END AS path,
              q
            FROM (
              SELECT string_split(base, '?')[1] AS pre,
                CASE WHEN strpos(base, '?') > 0
                     THEN base[strpos(base, '?')+1:] ELSE '' END AS q
              FROM (SELECT string_split(trim({expr}), '#')[1] AS base)
            )
          )
        )
        """,
    ).strip()


def with_normalized_url(
    df: DataFrame, url_col: str = "url", out_col: str = "url_norm"
) -> DataFrame:
    return df.withColumn(out_col, normalize_url_col(F.col(url_col)))


def revisit_stats(
    df: DataFrame, key_col: str = "url_norm", order_col: str = "doc_id"
) -> DataFrame:
    """(key, n_snapshots, latest) — per canonical URL, how many crawl
    snapshots exist and which is current (max order_col). One partial-agg
    shuffle on the canonical key."""
    return df.groupBy(key_col).agg(
        F.count("*").alias("n_snapshots"),
        F.max(order_col).alias("latest"),
    )


def revisit_keep_latest(
    pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """Latest-wins revisit dedup over the pages table: per canonical URL
    keep the most recent fetch (max warc_ts, tie-break max raw url —
    deterministic at any parallelism). Election shuffles only
    (url_norm, ts, url); the payload (html/text) is re-attached by an
    equi-join on the elected key. Assumes (url_norm, warc_ts, url) is
    unique per fetch (true for a crawl log); exact re-fetch rows are
    collapsed by the final dropDuplicates on the election key.
    """
    with_norm = with_normalized_url(pages, url_col)
    winners = (
        with_norm.groupBy("url_norm")
        .agg(F.max(F.struct(F.col(ts_col), F.col(url_col))).alias("_w"))
        .select(
            F.col("url_norm").alias("_w_norm"),
            F.col(f"_w.{ts_col}").alias("_w_ts"),
            F.col(f"_w.{url_col}").alias("_w_url"),
        )
    )
    # ts matched null-SAFELY: when every fetch of a canonical URL has
    # NULL warc_ts (the in-domain "Time unknown" sentinel), the elected
    # winner's ts is NULL and a plain equi-join would never match —
    # silently dropping the whole URL group (round-5 ADVICE finding).
    cond = (
        (with_norm["url_norm"] == F.col("_w_norm"))
        & with_norm[ts_col].eqNullSafe(F.col("_w_ts"))
        & (with_norm[url_col] == F.col("_w_url"))
    )
    lead = ["url_norm", ts_col, url_col]
    rest = [c for c in with_norm.columns if c not in lead]
    return (
        with_norm.join(winners, cond)
        .select(*lead, *rest)  # same column order as the round-5 key-join
        .dropDuplicates(["url_norm"])
    )


def ingest_recrawl(
    table,
    new_pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> int:
    """Newest-wins recrawl ingest into an ACID SnapshotTable keyed on the
    CANONICAL url: the crawl-identity analog of the reference's
    insert-or-update document write (src/simages/duplicate_finder.py:111-115)
    under continuous re-fetching.

      1. canonicalize + batch-internal latest-wins (revisit_keep_latest);
      2. drop batch rows NOT newer than the stored fetch of the same
         canonical URL — a re-delivered old crawl must never clobber a
         newer stored page (late/duplicate WARC delivery is the norm);
      3. one atomic `upsert` keyed on url_norm.

    Scale shape: the staleness check reads ONLY (url_norm, ts) — a
    column-pruned scan of the table joined against the (broadcast-sized)
    batch keys; the full rows never leave the batch side. Returns the
    committed version, or the current version unchanged (no commit) when
    every batch row is stale. Idempotent: re-ingesting the same crawl is
    a no-op commit-wise for rows that did not win.

    The table's schema must already carry `url_norm` (first ingest
    creates it via this function — callers never write raw-url-keyed
    rows alongside canonical ones).
    """
    from pyspark.sql import functions as F  # local: keep module header slim

    batch = revisit_keep_latest(new_pages, url_col, ts_col)
    if table.current_version() is not None:
        stored = table.read().select(
            "url_norm", F.col(ts_col).alias("_stored_ts")
        )
        batch = (
            batch.join(stored, "url_norm", "left")
            .where(
                F.col("_stored_ts").isNull()
                | (F.col(ts_col) > F.col("_stored_ts"))
            )
            .drop("_stored_ts")
        )
        if batch.isEmpty():
            return table.current_version()
        return table.upsert(batch, key="url_norm")
    return table.upsert(batch, key="url_norm")
