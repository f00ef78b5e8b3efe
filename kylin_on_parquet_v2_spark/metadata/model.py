"""Star/snowflake data model descriptors.

Reference parity: ``core-metadata/.../model/DataModelDesc.java:57-113``
(rootFactTable :83, joinTables[] :87, filterCondition :100, partition desc
:272-277) and ``JoinDesc`` (type INNER/LEFT, primary_key[]/foreign_key[]
arrays; composite keys and multi-hop snowflake per
``examples/test_case_data/localmeta/model_desc/ci_inner_join_model.json``).

Spark mapping: the model is pure metadata plus :func:`DataModel.flat_table`,
which produces the joined "flat" DataFrame the cube build aggregates
(reference build-side equivalent: ``kylin-spark-engine/.../builder/CreateFlatTable.scala:43-95``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class JoinDesc:
    """One equi-join edge: fact-side foreign keys -> lookup primary keys."""

    foreign_key: tuple[str, ...]
    primary_key: tuple[str, ...]
    join_type: str = "inner"  # inner | left

    def __post_init__(self) -> None:
        if len(self.foreign_key) != len(self.primary_key):
            raise ValueError("foreign_key and primary_key arity mismatch")
        if self.join_type not in ("inner", "left"):
            raise ValueError(f"unsupported model join type: {self.join_type}")


@dataclass(frozen=True)
class JoinTable:
    """A lookup table joined into the model (TableKind LOOKUP).

    ``alias`` allows repeated dimension roles (the reference joins
    TEST_ACCOUNT twice as BUYER_ACCOUNT / SELLER_ACCOUNT). ``fk_table``
    names the table whose columns the foreign keys live on, enabling
    multi-hop snowflake (defaults to the fact table).
    """

    table: str
    join: JoinDesc
    alias: str | None = None
    fk_table: str | None = None

    @property
    def name(self) -> str:
        return self.alias or self.table


@dataclass(frozen=True)
class DataModel:
    """A star/snowflake model over registered source views."""

    name: str
    fact_table: str
    lookups: tuple[JoinTable, ...] = ()
    filter_condition: str | None = None  # SQL boolean expr over fact columns
    #: computed columns added to the flat table: name -> SQL expression
    computed_columns: dict[str, str] = field(default_factory=dict)
    partition_column: str | None = None  # event-time column for segments

    def flat_table(
        self,
        spark: SparkSession,
        broadcast_lookups: bool = True,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """Build the joined flat DataFrame (fact ⋈ lookups, snowflake-aware).

        Scale notes: lookup tables in a star schema are small by definition —
        broadcast them so the flat-table build is shuffle-free on the fact
        side. Multi-hop (snowflake) joins resolve in declaration order, so a
        lookup whose ``fk_table`` is another lookup joins after it.
        """
        df = spark.table(self.fact_table)
        if self.filter_condition:
            df = df.filter(F.expr(self.filter_condition))
        for cc_name, cc_expr in self.computed_columns.items():
            df = df.withColumn(cc_name, F.expr(cc_expr))
        for lk in self.lookups:
            dim = spark.table(lk.table)
            if lk.alias:
                # Disambiguate repeated roles by prefixing columns.
                dim = dim.select([F.col(c).alias(f"{lk.alias}_{c}") for c in dim.columns])
                pk = [f"{lk.alias}_{p}" for p in lk.join.primary_key]
            else:
                pk = list(lk.join.primary_key)
            cond = None
            for fk_col, pk_col in zip(lk.join.foreign_key, pk):
                c = df[fk_col] == dim[pk_col]
                cond = c if cond is None else (cond & c)
            if broadcast_lookups:
                dim = F.broadcast(dim)
            df = df.join(dim, cond, lk.join.join_type)
            # Drop the duplicate PK columns (FK survives) unless aliased role.
            if not lk.alias:
                for pk_col, fk_col in zip(pk, lk.join.foreign_key):
                    if pk_col != fk_col:
                        df = df.drop(dim[pk_col])
        if columns:
            df = df.select(*columns)
        return df
