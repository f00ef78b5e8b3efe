"""Engine-registered SQL aggregate functions.

``intersect_count(col, filter_col, array(v1, v2, ...))`` — the reference's
retention/funnel UDAF (``kylin-spark-common/.../udaf/IntersectCount.scala``,
``IntersectBitmapCounter.scala``): per group, the size of the intersection of
the per-cohort distinct value sets {col | filter_col = v}.

``intersect_value(...)`` — same cohorts, but the member VALUES
(``BitmapIntersectValueAggFunc.java``), rendered ``"[v1,v2,...]"`` sorted /
``""`` empty. Both accept '|'-separated OR-union cohorts
(``RetentionPartialResult.FILTER_DELIMETER``).

Two execution paths:
- pushdown: the Arrow-batched pandas GROUPED_AGG UDAF below (set
  intersection per group — correct at any scale Spark can group, but ships
  column data into Python);
- routed: the query router rewrites the call onto a stored bitmap measure
  and never evaluates the UDAF — word bags are bit_and-ed JVM-side
  (``cube/dictionary.py::bitmap_intersect_count``), reference
  ``AggregatePlan.scala:68-92``.

Spark restriction worth knowing: a pandas GROUPED_AGG UDAF cannot share an
Aggregate with non-pandas aggregate functions (INVALID_PANDAS_UDF_PLACEMENT),
so pushdown queries mixing ``intersect_count`` with e.g. ``count(distinct)``
must split; routed execution has no such limit.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint inference needs it

from pyspark.sql import SparkSession


def register_udafs(spark: SparkSession) -> None:
    """Idempotently register engine UDAFs on ``spark``."""
    from pyspark.sql.functions import pandas_udf

    def _cohort(col: pd.Series, filt: pd.Series, v) -> set:
        """One cohort's member set. A string cohort may be an OR-union of
        values separated by '|' (RetentionPartialResult.FILTER_DELIMETER,
        ``kylin.query.intersect.separator`` default) — split + trim like
        the reference's StringUtil.splitAndTrim."""
        if isinstance(v, str) and "|" in v:
            members = [m.strip() for m in v.split("|") if m.strip()]
            return set(col[filt.isin(members) & col.notna()])
        return set(col[(filt == v) & col.notna()])

    @pandas_udf("long")
    def intersect_count(col: pd.Series, filt: pd.Series, values: pd.Series) -> int:
        inter: set | None = None
        for v in values.iloc[0]:
            cohort = _cohort(col, filt, v)
            inter = cohort if inter is None else (inter & cohort)
            if not inter:
                break
        return len(inter) if inter is not None else 0

    spark.udf.register("intersect_count", intersect_count)

    @pandas_udf("string")
    def intersect_value(col: pd.Series, filt: pd.Series, values: pd.Series) -> str:
        """``intersect_value(col, filter_col, array(...))`` — the member
        VALUES present in every cohort, formatted ``"[v1,v2,...]"`` sorted
        ascending, ``""`` when empty (reference
        ``BitmapIntersectValueAggFunc.java`` / ``RetentionPartialResult
        .valueResult()``; we emit decoded values, not dictionary ids, so an
        independent engine can reproduce the answer)."""
        inter: set | None = None
        for v in values.iloc[0]:
            cohort = _cohort(col, filt, v)
            inter = cohort if inter is None else (inter & cohort)
            if not inter:
                break
        if not inter:
            return ""

        def _fmt(x) -> str:
            # pandas promotes nullable int64 to float64: re-narrow integral
            # floats so the rendering matches the JVM cast of the true type.
            # CONTRACT (not a caveat): float/double measure columns are
            # rejected — structurally at digest time (IntersectValueTypeError,
            # query/digest.py) and here at runtime for raw-pushdown callers
            # that bypass the engine — because an integral true-float would
            # render "3" here but "3.0" on the routed dictionary decode.
            if isinstance(x, float):
                if not x.is_integer():
                    raise ValueError(
                        "intersect_value over a float-typed column is not "
                        "supported (render divergence vs the routed decode); "
                        "use an integer or string column"
                    )
                return str(int(x))
            return str(x)

        return "[" + ",".join(_fmt(x) for x in sorted(inter)) + "]"

    spark.udf.register("intersect_value", intersect_value)
