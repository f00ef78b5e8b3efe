"""Scale-curve spot-check (round-7 verdict item 7): run the heaviest
pipeline operators at sf0.1 and at a synthetic 10x replica ("sf1") and
report the scaling exponent alpha where t ~ N^alpha (alpha = log10(t10/t1)
for a 10x step). Plan shapes predict ~linear (alpha ~ 1); anything
super-linear is a finding.

The 10x replica is for PERFORMANCE measurement only (TESTDATA.md data is
never modified): each of the 10 copies is the sf0.1 corpus under a
DENSITY-PRESERVING per-copy transform, so a linear operator sees exactly
10x the work:

- documents: every word gets a per-copy suffix (regexp, pure JVM), so
  shingles/grams never match ACROSS copies — each copy keeps the
  fixture's exact duplicate/contamination structure, and total duplicate
  pairs scale 10x (not the 45x a verbatim replication's cross-copy
  10-cliques would inject);
- embeddings: a per-copy deterministic coordinate sign-flip — an
  ORTHOGONAL transform, so all within-copy dot products/norms (and hence
  every near-dup pair and k-means geometry) are preserved bit-for-bit in
  structure, while cross-copy cosines become pseudo-random noise.

Usage: python scripts/scale_curve.py [out.json] [--copies N] [--ops a,b,c]

``--copies 100`` (round-8 verdict item 5) brackets the exponent from
ABOVE: at 10x, sf0.1 still sits under local[32]'s parallelism floor, so
the measured alphas are lower bounds; at 100x every stage is
parallelism-saturated and the 10x->100x slope approximates the asymptote.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_BASE = "/root/testdata/sf0.1"
COPIES = 10


def build_replica(spark, out_dir: str, copies: int = COPIES) -> None:
    from pyspark.sql import functions as F

    from kylin_on_parquet_v2_spark.session import SOURCE_TABLES

    os.makedirs(out_dir, exist_ok=True)
    docs = spark.read.parquet(os.path.join(SF_BASE, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_BASE, "embeddings.parquet"))
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    n_vecs = emb.agg(F.max("vec_id")).first()[0] + 1

    doc_parts = []
    emb_parts = []
    for c in range(copies):
        tag = f"c{c}"
        # NOTE on byte-level perceptual ops (multimodal dHash): the per-word
        # suffix is the right isolation for SHINGLE-keyed ops but leaves
        # cross-copy byte strips within a few hamming bits of each other,
        # so a NARROW (32-bit) perceptual hash pairs copies quadratically —
        # the same class of artifact as the r8 verbatim-label semantic run.
        # Prefix-based decorrelation was tried and is structurally unsound
        # (a per-copy prefix shared by every doc in the copy zeroes/aligns
        # the leading hash bits and inflates WITHIN-copy pairs instead).
        # The honest replica measurement for perceptual dedup therefore
        # uses the WIDER hash (dhash bits=64 — the production geometry; see
        # PERFORMANCE.md), whose cross-copy distances concentrate far above
        # the threshold without any replica contortions.
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(c * n_docs)).alias("doc_id"),
                # per-copy word suffix: shingles match only within a copy
                F.regexp_replace("text", r"(\S+)", r"$1" + tag).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        # per-copy orthogonal sign-flip (deterministic in (copy, dim idx));
        # the copy index is bound via a factory — pyspark counts a default
        # arg as a third lambda parameter and rejects it
        def _flip_fn(copy):
            def f(x, j):
                sign = (
                    F.when(
                        F.pmod(F.hash(F.lit(copy) * 1000 + j), 2) == 0, F.lit(1.0)
                    )
                    .otherwise(F.lit(-1.0))
                    .cast("float")
                )
                return x * sign

            return f

        flip = F.transform("embedding", _flip_fn(c))
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(c * n_vecs)).alias("vec_id"),
                flip.alias("embedding"),
                # per-copy label offset: given-label clusters REPLICATE
                # instead of merging (verbatim labels would fuse each
                # cluster 10x and square its pair work — an artifact of
                # the replica, not of the operator)
                (F.col("label") + F.lit(c * 1000)).cast("int").alias("label"),
            )
        )
    all_docs = doc_parts[0]
    for p in doc_parts[1:]:
        all_docs = all_docs.unionAll(p)
    all_emb = emb_parts[0]
    for p in emb_parts[1:]:
        all_emb = all_emb.unionAll(p)
    # scale the file count too, so scan parallelism scales with the data
    all_docs.repartition(copies).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    all_emb.repartition(copies).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    for t in SOURCE_TABLES:
        if t in ("documents", "embeddings"):
            continue
        link = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SF_BASE, f"{t}.parquet"), link)


def main() -> None:
    from kylin_on_parquet_v2_spark.corpus.pipeline import (
        corpus_bpe_encode,
        corpus_top_ngrams,
        decontam_chargram_report,
        dedup_clusters,
        dedup_incremental_refresh,
        dedup_passages,
        decontam_filter,
        export_training_shards,
        multimodal_asset_dedup,
        multimodal_perceptual_dedup,
        sample_split_leakage_safe,
        search_bm25,
        semantic_dedup_given,
        text_perplexity,
        text_tfidf_keywords,
        text_vocab_coverage,
    )
    from kylin_on_parquet_v2_spark.session import get_spark, register_views

    spark = get_spark("scale-curve")
    spark.sparkContext.setLogLevel("ERROR")

    args = sys.argv[1:]
    copies = COPIES
    only_ops: list[str] | None = None
    if "--copies" in args:
        i = args.index("--copies")
        if i + 1 >= len(args):
            raise SystemExit("--copies needs a value")
        copies = int(args[i + 1])
        if copies < 2:
            raise SystemExit("--copies must be >= 2 (the exponent divides by log10(copies))")
        del args[i : i + 2]
    if "--ops" in args:
        i = args.index("--ops")
        if i + 1 >= len(args):
            raise SystemExit("--ops needs a comma-separated list of op names")
        only_ops = args[i + 1].split(",")
        del args[i : i + 2]

    replica = f"/tmp/kylin_scale_sfx{copies}"
    shutil.rmtree(replica, ignore_errors=True)
    t0 = time.perf_counter()
    build_replica(spark, replica, copies=copies)
    print(f"{copies}x replica built in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    ops = {
        "dedup_incremental_refresh": dedup_incremental_refresh,
        "dedup_clusters": dedup_clusters,
        "semantic_dedup_given": semantic_dedup_given,
        "decontam_filter": decontam_filter,
        "export_training_shards": export_training_shards,
        # r8 operators
        "dedup_passages": dedup_passages,
        "corpus_top_ngrams": corpus_top_ngrams,
        "decontam_chargram_report": decontam_chargram_report,
        # r10 operators
        "corpus_bpe_encode": corpus_bpe_encode,
        "multimodal_perceptual_dedup": multimodal_perceptual_dedup,
        "multimodal_asset_dedup": multimodal_asset_dedup,
        "text_vocab_coverage": text_vocab_coverage,
        # r11 operators
        "search_bm25": search_bm25,
        "text_perplexity": text_perplexity,
        "text_tfidf_keywords": text_tfidf_keywords,
        "sample_split_leakage_safe": sample_split_leakage_safe,
    }
    if only_ops is not None:
        unknown = [o for o in only_ops if o not in ops]
        if unknown:
            raise SystemExit(
                f"unknown op(s) {unknown}; known: {', '.join(sorted(ops))}"
            )
        ops = {k: v for k, v in ops.items() if k in only_ops}

    def run(fn, sf_dir: str) -> tuple[float, int]:
        # fresh view registration per run; noop sink = full materialization
        register_views(spark, sf_dir)
        t = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t, df.count()

    out: dict = {"copies": copies, "ops": {}}
    for name, fn in ops.items():
        # warm pass at sf0.1 first so codegen/session costs don't inflate
        # the small-side timing (which would UNDERSTATE the exponent)
        run(fn, SF_BASE)
        t1, n1 = run(fn, SF_BASE)
        t10, n10 = run(fn, replica)
        alpha = math.log10(t10 / t1) / math.log10(copies)
        out["ops"][name] = {
            "sec_sf0.1": round(t1, 3),
            f"sec_x{copies}": round(t10, 3),
            "rows_sf0.1": n1,
            f"rows_x{copies}": n10,
            "ratio": round(t10 / t1, 2),
            "alpha": round(alpha, 3),
        }
        print(name, out["ops"][name], file=sys.stderr)

    path = args[0] if args else "/tmp/scale_curve.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
