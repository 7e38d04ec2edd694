"""Bucket → candidate-pair expansion (shared by LSH / SimHash / exact).

One shuffle instead of three: rather than self-joining the exploded
bucket table (shuffle both sides + bucket-count join), group each bucket
once, collect its (deduped, sorted) member array, and expand pairs with
pure JVM array expressions — `transform` over the array with an indexed
lambda emits (ids[i], ids[j>i]) structs, so src<dst ordering falls out of
the sort. Output volume is identical; shuffle volume drops ~3× and the
sort-merge passes disappear.

Skew (north_rule): buckets above `cap` expand quadratically — members are
salt-split *inside the expression* (filter by xxhash64(member) % nsalt,
pairs only within a salt class), and each salt class is additionally
TRUNCATED to `cap` members (deterministic: the array is sorted, slice
keeps the smallest). Without the truncation a 10⁵-copy viral page still
emits nsalt·C(n/nsalt, 2) ≈ 6×10⁸ pairs — the salt alone bounds by a
constant factor, not absolutely; with it the worst bucket emits at most
nsalt·C(cap, 2) pairs, period. Identical-content floods keep full
connectivity through the exact-hash star layer regardless (their
truncated LSH pairs are redundant); genuinely-near-dup viral clusters
lose bounded recall. Never silent: `lsh_metrics`/`suffix_metrics` report
split AND truncated bucket counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bind(col: Column, f) -> Column:
    """Evaluate `col` ONCE and pass it to `f` as a bound lambda variable.

    Poor man's `let`: Spark evaluates a higher-order lambda's input
    eagerly and binds it as a variable, so references inside `f` are
    cheap lookups. Without this, every reference to a shared Column
    re-evaluates its whole expression subtree — `_pairs_of` references
    its array 3× *per element*, which turns a filter over a 100k-member
    hot bucket into ~10^8 re-evaluations (measured: 182 s for one viral
    bucket; ~1 s bound)."""
    return F.transform(F.array(col), f)[0]


def _pairs_of(arr: Column) -> Column:
    """array<T> (sorted) → array<struct<a:T, b:T>> of all i<j pairs.

    `arr` must be a cheap reference (column or bound lambda variable) —
    wrap computed expressions in `_bind` first."""
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )


def bucket_pairs(
    df: DataFrame,
    key_cols: list[str],
    member_col: Column | str,
    cap: int = 200,
    nsalt: int = 8,
    dedup: bool = True,
) -> DataFrame:
    """(keys..., member) → distinct (a, b) pairs co-bucketed by the keys.

    Member may be any orderable column (long, struct, ...). Buckets larger
    than `cap` are salt-split — pairs form only within a salt class — and
    each salt class is truncated to its `cap` smallest members, so the
    worst bucket emits ≤ nsalt·C(cap, 2) pairs regardless of size (see
    module docstring; callers' metrics surface the truncation).

    `dedup=False` skips the cross-bucket pair dedup (one exchange of the
    pair set): pass it ONLY when the caller either proves each member
    belongs to exactly one bucket (pairs unique by construction — the
    suffix anchors: one (h1, h2) per (doc_id, pos)) or runs its own
    dropDuplicates downstream anyway (the SimHash Hamming filter, the
    pipeline's candidate union). With dedup=False the output may contain
    the same (a, b) once per shared bucket.
    """
    member = F.col(member_col) if isinstance(member_col, str) else member_col
    grouped = (
        df.groupBy(*key_cols)
        .agg(F.sort_array(F.collect_set(member)).alias("ids"))
        .where(F.size("ids") > 1)
    )
    # hash each member ONCE (interpreted xxhash64 per element is the unit
    # cost here — don't pay it nsalt times), then the per-salt filter is a
    # cheap field compare over the bound array.
    salted = _bind(
        F.transform(
            F.col("ids"),
            lambda x: F.struct(
                F.pmod(F.xxhash64(x), F.lit(nsalt)).alias("s"), x.alias("id")
            ),
        ),
        lambda tagged: F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.lit(nsalt - 1)),
                lambda s: _bind(
                    F.slice(
                        F.transform(
                            F.filter(tagged, lambda e: e["s"] == s),
                            lambda e: e["id"],
                        ),
                        1,
                        cap,
                    ),
                    _pairs_of,
                ),
            )
        ),
    )
    pairs = F.when(F.size("ids") <= cap, _pairs_of(F.col("ids"))).otherwise(salted)
    out = grouped.select(F.explode(pairs).alias("p")).select(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    )
    return out.dropDuplicates(["a", "b"]) if dedup else out


def bucket_star_edges(
    df: DataFrame, key_cols: list[str], member_col: Column | str, dedup: bool = True
) -> DataFrame:
    """(keys..., member) → star edges (min-member, other) per bucket.

    For buckets whose members are *guaranteed identical* (e.g. grouped by
    a full content hash) connectivity is all downstream CC needs — linear
    edges instead of quadratic (a 1M-copy spam page yields 10^6 edges,
    not 5·10^11).

    `dedup=False` skips the cross-bucket dedup exchange; safe whenever
    each member belongs to exactly one bucket (e.g. key = full content
    hash: a doc has ONE sha, so every (min, other) edge is emitted by
    exactly one bucket).
    """
    member = F.col(member_col) if isinstance(member_col, str) else member_col
    grouped = (
        df.groupBy(*key_cols)
        .agg(F.sort_array(F.collect_set(member)).alias("ids"))
        .where(F.size("ids") > 1)
    )
    stars = F.transform(
        F.slice(F.col("ids"), 2, F.size("ids")),
        lambda y: F.struct(F.col("ids")[0].alias("a"), y.alias("b")),
    )
    out = grouped.select(F.explode(stars).alias("p")).select(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    )
    return out.dropDuplicates(["a", "b"]) if dedup else out
