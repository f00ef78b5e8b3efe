"""Training-data curation operators: deterministic hash sampling (per-stratum
rates / corpus mixing) and token-budget sequence packing.

Both are pure JVM-side column arithmetic — no UDFs, no shuffle beyond the one
window/groupBy they declare — and bit-replayable by the DuckDB oracle.

Scale shape (100 TB): sampling is a stateless per-row filter (predicate
pushes to the scan, selectivity * scan cost); packing is one window per
stratum partition — the shuffle key is the stratum, so skewed strata are the
limit, and the contiguous-fill bin rule needs no global coordination beyond
that one partition sort (each executor bins its stratum independently).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.pipeline.text import token_count

#: Knuth multiplicative-hash constants. Chosen over md5/xxhash on purpose:
#: the mix is plain bigint arithmetic, so the SAME expression runs on Spark
#: and on the DuckDB oracle (and any other engine) with identical results —
#: reproducible sampling is a feature, not an accident, in a training
#: pipeline (re-running the job must select the same documents).
_MOD_PRIME = 2_147_483_647
_KNUTH = 2_654_435_761
_HASH_SPACE = 4_294_967_296  # 2^32


def hash_bucket(key: Column) -> Column:
    """Deterministic uniform bucket in [0, 2^32) from an integer key.

    ``pmod(key, p) * K mod 2^32`` — the pre-mod keeps the product inside
    int64 for any bigint key (p * K < 2^63), so no overflow wrap differences
    between engines.
    """
    return F.pmod(F.pmod(key, F.lit(_MOD_PRIME)) * F.lit(_KNUTH), F.lit(_HASH_SPACE))


def hash_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows keyed by ``key_col``.

    Unlike ``df.sample()`` (seed-dependent on partition layout), the decision
    is a pure function of the key: stable across reruns, repartitions and
    engines — the property a 100 TB curation job needs for resumability.
    """
    return df.filter(hash_bucket(F.col(key_col)) < int(rate * _HASH_SPACE))


def stratified_sample(
    df: DataFrame, stratum_col: str, rates: dict[str, float], key_col: str
) -> DataFrame:
    """Per-stratum deterministic sampling — the "data mixing" op: each
    stratum (language, source, quality tier) keeps its own rate. Strata
    absent from ``rates`` are dropped (rate 0). One stateless filter, no
    shuffle; the predicate reaches the Parquet scan.
    """
    thresh = F.lit(0)
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum_col) == value, F.lit(int(rate * _HASH_SPACE))
        ).otherwise(thresh)
    return df.filter(hash_bucket(F.col(key_col)) < thresh)


def stratified_quota(
    df: DataFrame,
    stratum_col: str,
    n: int,
    key_col: str,
) -> DataFrame:
    """Exact-count stratified sampling: keep EXACTLY ``n`` rows per stratum
    (fewer when the stratum is smaller) — the balanced-eval-set /
    class-balancing op that rate-based sampling can't express (a rate keeps
    a proportional share, never a fixed count). Selection is the n smallest
    hash values per stratum, so it is a pure function of the keys: stable
    across reruns, repartitions and engines, and ADDING rows to a stratum
    only ever swaps members whose hash ranks past n — no global reshuffle
    of the selection.

    Scale shape (100 TB): one window per stratum partition (the same
    shuffle key :func:`pack_token_budget` uses); rank-by-hash needs no
    global sort — each stratum ranks independently, skewed strata are the
    limit exactly as for any per-stratum op.
    """
    w = Window.partitionBy(stratum_col).orderBy(
        hash_bucket(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def domain_mix(
    docs: DataFrame,
    token_target: int,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Target-driven corpus mixing: derive each domain's acceptance rate
    FROM a per-domain token budget (rate = min(1, target / domain_tokens)),
    then apply the deterministic hash filter. The two-phase shape a "cap
    every source at N tokens" curation spec needs when the corpus sizes are
    not known up front — :func:`stratified_sample` with computed rates.

    Scale shape (100 TB): phase 1 is one partially-aggregated groupBy down
    to |domains| rows; phase 2 broadcasts those rows back (no shuffle of
    the corpus) and filters with pure column arithmetic. The threshold uses
    ``floor`` explicitly — double→long CAST truncates on Spark but rounds
    on other engines, and reproducible sampling must not depend on that.

    Returns the kept rows: (stratum, key, n_tokens, rate).
    """
    with_tok = docs.select(
        F.col(stratum_col),
        F.col(key_col),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    rates = (
        with_tok.groupBy(stratum_col)
        .agg(F.sum("n_tokens").alias("domain_tokens"))
        .select(
            stratum_col,
            F.least(
                F.lit(1.0), F.lit(float(token_target)) / F.col("domain_tokens")
            ).alias("rate"),
        )
    )
    return with_tok.join(F.broadcast(rates), stratum_col).filter(
        hash_bucket(F.col(key_col))
        < F.floor(F.col("rate") * F.lit(float(_HASH_SPACE)))
    )


def pack_token_budget(
    docs: DataFrame,
    budget: int,
    stratum_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to training shards ("bins") of ~``budget`` tokens by
    contiguous fill: within each stratum, documents in ``order_col`` order
    accumulate into a bin until the budget is crossed, then the next bin
    starts. bin = floor(tokens_before_this_doc / budget) — the standard
    distributed packing rule: it needs only a prefix sum (one window over
    the stratum partition), not the sequential first-fit scan, so every
    stratum bins independently and deterministically.

    Returns one row per document: stratum, order key, token count, bin id.
    """
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = token_count(F.col(text_col))
    return (
        docs.select(
            F.col(stratum_col),
            F.col(order_col),
            tok.alias("n_tokens"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "bin_id",
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(budget)).cast(
                "long"
            ),
        )
    )


def split_corpus(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test split: adds a ``split`` column chosen by
    where the row's hash bucket falls among cumulative fraction thresholds.

    Like :func:`hash_sample`, membership is a pure function of the key —
    stable under reruns, repartitions, appends (a new doc never moves an
    old doc's split) and engines; the assignment is one CASE expression at
    the scan, no shuffle, no sort. Fractions must sum to 1 (validated).
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if not fractions or any(v <= 0 for v in fractions.values()):
        raise ValueError("every split fraction must be positive")
    if "split" in df.columns:
        raise ValueError("input already has a 'split' column")
    bucket = hash_bucket(F.col(key_col))
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = bucket < int(acc * _HASH_SPACE)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def split_corpus_leakage_safe(
    docs: DataFrame,
    fractions: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/val/test split that cannot LEAK duplicates across splits: the
    assignment hashes the document's exact-duplicate GROUP (the minimum id
    among docs sharing a normalized-content digest), not the doc's own id,
    so every copy of a document lands in the same split — a val/test
    document never has a training-set twin. The standard eval-hygiene
    requirement that a naive per-doc split silently violates.

    100 TB shape: one md5 digest map-side, one groupBy(digest) with
    map-side min-combine (duplicate-group-sized output), one join back on
    the digest, then the same shuffle-free CASE assignment as
    :func:`split_corpus`. The canonical key — not the digest — feeds the
    hash so adding NEW duplicates of an existing doc never moves the
    group's split (min of ids only changes if an EARLIER id appears, which
    append-only corpora never do)."""
    from kylin_on_parquet_v2_spark.pipeline.dedup import normalize_text

    digests = docs.select(
        F.col(id_col),
        F.md5(normalize_text(F.col(text_col)).cast("binary")).alias("__digest"),
    )
    canon = digests.groupBy("__digest").agg(F.min(id_col).alias("__canon"))
    keyed = (
        digests.join(canon, "__digest")
        .select(id_col, "__canon")
        .withColumnRenamed(id_col, "__doc")
    )
    assigned = split_corpus(keyed, fractions, key_col="__canon")
    return docs.join(
        assigned.select(F.col("__doc").alias(id_col), "split"), id_col
    )
