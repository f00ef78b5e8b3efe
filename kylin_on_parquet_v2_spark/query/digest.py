"""SQL digest: a structural summary of an aggregate query, extracted from
Spark's *analyzed* logical plan (via the JVM handle — Catalyst is our Calcite).

Reference parity: ``query/.../relnode/OLAPContext.java:122-182`` accumulates
firstTableScan, groupByColumns, aggregations, filterColumns, joins into a
``SQLDigest`` (:184-218) that the realization chooser matches against cubes.
We extract the same summary, but from Catalyst's resolved plan instead of a
frozen Calcite tree — Spark has already parsed, resolved and type-coerced the
query for us.

Extraction is *best-effort by design*: any shape we don't recognize returns
None and the engine answers via the pushdown path (``spark.sql``), which is
always correct. A digest is only ever used to *accelerate*.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_AGG_RE = re.compile(
    r"^(sum|min|max|count|avg)\(\s*(distinct\s+)?(.+?)\s*\)$", re.IGNORECASE | re.DOTALL
)
# percentile_approx(col, CAST(q AS DOUBLE), accuracy, ...) — Spark's resolved
# call; digested so the router can serve it from a mergeable histogram
# sketch measure (the reference rewrites percentile onto PercentileCounter
# state the same way, PercentileMeasureType.java:35-110)
_PCT_RE = re.compile(
    r"^percentile_approx\(\s*([\w.]+)\s*,\s*(?:cast\(\s*)?([0-9.]+)(?:bd|d)?\s*(?:as\s+double\s*\))?\s*(?:,.*)?\)$",
    re.IGNORECASE | re.DOTALL,
)
#: ``table.column`` qualifier — the negative lookahead keeps NUMERIC
#: literals out: Catalyst renders decimal literals with a type suffix
#: (``300.00BD``) whose ``300.00`` prefix would otherwise parse as a
#: qualifier and make every decimal-filtered query undigestible
_QUALIFIED = re.compile(r"\b(?!\d+\.)(\w+)\.(\w+)\b")
_EQ_PAIR = re.compile(r"\(?\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*\)?")
# count(DISTINCT CASE WHEN <cond> THEN <col> END) — the conditional-distinct
# spelling of INTERSECT_COUNT cohorts (reference corpus
# sql_intersect_count/query00.sql digests to this shape); no ELSE branch, so
# non-matching rows contribute NULL (ignored by DISTINCT)
_CASE_DISTINCT_RE = re.compile(
    r"^CASE\s+WHEN\s+(.+?)\s+THEN\s+([\w.`]+)\s+END$", re.IGNORECASE | re.DOTALL
)
# Catalyst renders lag/lead frames as e.g. "ROWS BETWEEN -1 FOLLOWING AND
# -1 FOLLOWING", which the SQL parser refuses on re-parse — normalize the
# negative bounds back to the PRECEDING/FOLLOWING spelling it accepts.
_NEG_FOLLOWING = re.compile(r"-(\d+)\s+FOLLOWING", re.IGNORECASE)
_NEG_PRECEDING = re.compile(r"-(\d+)\s+PRECEDING", re.IGNORECASE)
# Frame-fixed window functions: the parser REJECTS an explicit frame for
# these ("Cannot specify window frame for lag function"), yet the analyzed
# expression renders one — drop the frame clause on re-parse.
_FRAME_FIXED = re.compile(
    r"^(lag|lead|ntile|row_number|rank|dense_rank|percent_rank|cume_dist)\s*\(",
    re.IGNORECASE,
)
_TRAILING_FRAME = re.compile(r"\s+(ROWS|RANGE)\s+BETWEEN\s+[^()]+\)$", re.IGNORECASE)


def _fix_frame_sql(sql: str) -> str:
    if _FRAME_FIXED.match(sql):
        return _TRAILING_FRAME.sub(")", sql)
    sql = _NEG_FOLLOWING.sub(r"\1 PRECEDING", sql)
    return _NEG_PRECEDING.sub(r"\1 FOLLOWING", sql)


@dataclass
class AggCall:
    func: str  # SUM | MIN | MAX | COUNT | AVG
    column: str | None  # unqualified; None for count(*) / agg-over-expression
    distinct: bool
    alias: str
    #: canonical SQL of the aggregated expression when it is not a bare
    #: column — matched against the model's declared computed columns
    #: (reference: CreateFlatTable.scala:43-95 bakes computed columns into
    #: the flat table; OLAPAggregateRel.java:528-600 rewrites agg calls
    #: over them onto measures)
    expr_sql: str | None = None
    #: percentile fraction for func == "PERCENTILE" (kept LAST — call sites
    #: construct AggCall positionally through expr_sql)
    q: float | None = None
    #: conditional distinct: ``count(distinct case when <cond> then col end)``
    #: — the cohort filter condition (unqualified SQL) and its columns
    cond_sql: str | None = None
    cond_cols: frozenset[str] = frozenset()
    #: func == "INTERSECT_COUNT"/"INTERSECT_VALUE": the cohort filter column and the cohort
    #: literal SQLs (``intersect_count(col, filter_col, array(...))``)
    filter_col: str | None = None
    values: tuple[str, ...] = ()
    #: multi-column ``count(distinct a, b, ...)`` — the bare columns
    columns: tuple[str, ...] = ()


def canonical_expr_sql(sql: str) -> str:
    """Normalize a *resolved* expression's SQL for structural comparison:
    strip backticks and table qualifiers, collapse whitespace, lowercase.

    Both sides of a computed-column match are resolved against the same
    fact-table schema (same parse tree, same type-coercion casts), so their
    ``Expression.sql()`` forms are directly comparable after this cleanup.
    """
    s = sql.replace("`", "")
    s = re.sub(r"\b[A-Za-z_]\w*\.(?=[A-Za-z_])", "", s)  # table qualifiers
    return re.sub(r"\s+", " ", s).strip().lower()


def resolved_expr_canon(spark, table: str, expr_sql: str) -> str | None:
    """Canonical form of ``expr_sql`` resolved against ``table``'s schema
    (used at cube-build time for declared computed columns)."""
    try:
        proj = spark.table(table).selectExpr(f"({expr_sql}) AS __cc__")
        alias = proj._jdf.queryExecution().analyzed().projectList().apply(0)
        return canonical_expr_sql(alias.child().sql())
    except Exception:
        return None


@dataclass
class JoinEdge:
    left_table: str
    right_table: str
    left_cols: tuple[str, ...]
    right_cols: tuple[str, ...]
    join_type: str  # inner | left


@dataclass
class SelectItem:
    """One output column: a group-by passthrough, an agg call, or a
    GROUPING() indicator (``grouping_of`` = the dimension it reports —
    per grouping set the router emits the 0/1 literal, the reference's
    AggregatePlan.scala:169-174 rewrite)."""

    name: str
    group_col: str | None = None
    agg: AggCall | None = None
    grouping_of: str | None = None


@dataclass
class SqlDigest:
    tables: set[str]
    joins: list[JoinEdge]
    group_cols: list[str]  # unqualified flat-table column names
    select: list[SelectItem] = field(default_factory=list)
    filter_sql: str | None = None  # unqualified, F.expr-able
    filter_cols: set[str] = field(default_factory=set)
    #: (col, asc, nulls_first) — explicit null ordering preserved
    sort: list[tuple[str, bool, bool]] = field(default_factory=list)
    limit: int | None = None
    #: HAVING over select-output aliases (Filter above Aggregate), post-agg
    having_sql: str | None = None
    having_cols: set[str] = field(default_factory=set)
    #: ROLLUP / CUBE / GROUPING SETS: the decoded grouping sets (each a
    #: subset of group_cols), None for a plain GROUP BY. The router expands
    #: these into per-set cuboid aggregations unioned back — the reference's
    #: AggregateMultipleExpandRule.java:45-120 rewrite.
    grouping_sets: list[list[str]] | None = None
    #: select items that exist only to evaluate HAVING (`having count(*)>5`
    #: with count(*) not selected — Spark's Project-over-Filter-over-Aggregate
    #: "extended aggregate" shape); dropped from the routed output at the end
    hidden: list[str] = field(default_factory=list)
    #: window functions evaluated over the aggregate's output (the
    #: reference's OLAPWindowRel — `query/.../relnode/OLAPWindowRel.java`
    #: executes window calls ABOVE the cube-served aggregate, so windows
    #: never block a cuboid route). One group of (name, expr_sql) per
    #: Window node, in evaluation order (innermost first); expr_sql is the
    #: re-parseable OVER() call referencing aggregate-output names.
    window_exprs: list[list[tuple[str, str]]] = field(default_factory=list)
    #: projection layers applied above the windows (scalar expressions over
    #: agg + window outputs, e.g. ``bal / total AS share``), each a full
    #: selectExpr list of (output name, sql), evaluation order
    window_projects: list[list[tuple[str, str]]] = field(default_factory=list)
    #: grouping EXPRESSIONS (``group by month(d)`` — the reference models
    #: these as time-hierarchy dimensions; we evaluate the expression over
    #: the layout's dim values and group on it): synthesized name ->
    #: (unqualified expr sql, base columns the layout must provide). The
    #: names also appear in group_cols, so downstream grouping/projection
    #: logic is untouched.
    group_exprs: dict[str, tuple[str, frozenset[str]]] = field(default_factory=dict)

    @property
    def aggs(self) -> list[AggCall]:
        return [s.agg for s in self.select if s.agg is not None]

    def needed_cols(self) -> frozenset[str]:
        """The column set a serving layout must provide as dimensions
        (grouping bases, filters, distinct/cohort columns) — the unit the
        cube planner's workload statistics count (CuboidStats parity)."""
        cols: set[str] = set()
        for c in self.group_cols:
            if c in self.group_exprs:
                cols |= set(self.group_exprs[c][1])
            else:
                cols.add(c)
        cols |= set(self.filter_cols)
        for a in self.aggs:
            if a.distinct and a.column is not None:
                cols.add(a.column)
            cols |= set(a.columns)
            cols |= set(a.cond_cols)
            if a.filter_col is not None:
                cols.add(a.filter_col)
        return frozenset(cols)


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _sort_entry(so) -> tuple[str, bool, bool] | None:
    """(column, ascending, nulls_first) from a resolved SortOrder; None when
    the sort key is not a bare column reference. Explicit null ordering IS
    captured: replaying ``ORDER BY k ASC NULLS LAST`` with Spark's default
    (nulls first) would misplace every NULL-keyed row — nullable group-by
    columns produce NULL groups, and row-set normalization cannot catch an
    ordering divergence (the reference honors explicit FIRST/LAST the same
    way, SortPlan.scala:34-77)."""
    child_sql = so.child().sql()
    if not re.fullmatch(r"[`\w.]+", child_sql):
        return None
    asc = "ASC" in str(so.direction().sql()).upper()
    nulls_first = "FIRST" in str(so.nullOrdering().sql()).upper()
    return (child_sql.replace("`", "").split(".")[-1], asc, nulls_first)


def sort_columns(sort) -> list:
    """Digested sort entries -> Spark Columns, null ordering preserved
    (2-tuples from hand-built digests fall back to Spark's defaults)."""
    from pyspark.sql import functions as F

    cols = []
    for entry in sort:
        c, asc = entry[0], entry[1]
        if len(entry) < 3:
            cols.append(F.col(c).asc() if asc else F.col(c).desc())
        elif asc:
            cols.append(F.col(c).asc_nulls_first() if entry[2] else F.col(c).asc_nulls_last())
        else:
            cols.append(F.col(c).desc_nulls_first() if entry[2] else F.col(c).desc_nulls_last())
    return cols


def _seq(jseq) -> list:
    return [jseq.apply(i) for i in range(jseq.size())]


def _unqualify(sql: str, valid_cols: set[str]) -> str | None:
    """Strip `table.` qualifiers; None if a referenced column is unknown."""
    ok = True

    def sub(m: re.Match) -> str:
        nonlocal ok
        if m.group(2) not in valid_cols:
            ok = False
        return m.group(2)

    out = _QUALIFIED.sub(sub, sql)
    return out if ok else None


def _attr_names(jexpr) -> set[str]:
    """Unqualified attribute names referenced by a resolved expression."""
    it = jexpr.references().iterator()
    names = set()
    while it.hasNext():
        names.add(it.next().name())
    return names


class IntersectValueTypeError(ValueError):
    """INTERSECT_VALUE over a float/double column is a contract violation:
    the routed dictionary decode renders ``3.0`` while the pandas pushdown
    twin re-narrows integral floats to ``3`` (pandas promotes nullable ints
    to float64, so the UDAF cannot distinguish a true float column) — a
    silent result divergence between execution paths. Rejected structurally
    at digest time; the UDAF also rejects fractional floats at runtime."""


def _intersect_call(jexpr) -> tuple[str, str, str, tuple[str, ...]] | None:
    """``intersect_count/intersect_value(col, filter_col, array(lit, ...))``
    (the registered pandas UDAFs — reference ``IntersectCount.scala`` /
    ``BitmapIntersectValueAggFunc.java`` spellings) ->
    (func, value column, filter column, deduplicated cohort literal SQLs).
    Extracted from the expression TREE, not its SQL string: PythonUDAF.sql()
    renders array literals unquoted, which is ambiguous to reparse."""
    try:
        if _cls(jexpr) != "AggregateExpression":
            return None
        fn = jexpr.aggregateFunction()
        if _cls(fn) != "PythonUDAF" or str(fn.name()) not in (
            "intersect_count",
            "intersect_value",
        ):
            return None
        args = _seq(fn.children())
        if len(args) != 3:
            return None
        if _cls(args[0]) != "AttributeReference" or _cls(args[1]) != "AttributeReference":
            return None
        if _cls(args[2]) != "CreateArray":
            return None
        vals: list[str] = []
        for lit in _seq(args[2].children()):
            if _cls(lit) != "Literal":
                return None
            if lit.sql() not in vals:  # executor requires distinct cohorts
                vals.append(lit.sql())
        if not vals:
            return None
        func = "INTERSECT_VALUE" if str(fn.name()) == "intersect_value" else "INTERSECT_COUNT"
        if func == "INTERSECT_VALUE":
            dt = str(args[0].dataType().simpleString())
            if dt in ("float", "double"):
                raise IntersectValueTypeError(
                    f"intersect_value over {dt}-typed column "
                    f"'{args[0].name()}' is not supported: the routed decode "
                    "and the pandas pushdown twin render float values "
                    "differently (3.0 vs 3) — point the measure at an "
                    "integer or string column"
                )
        return func, str(args[0].name()), str(args[1].name()), tuple(vals)
    except IntersectValueTypeError:
        raise
    except Exception:
        return None


def _relation_name(node) -> str | None:
    """SubqueryAlias over a BASE relation -> alias name.

    The alias must bottom out in a real scan (View/Relation chain). An
    alias over anything computed — a derived-table subquery, an inlined
    CTE aggregate — is NOT a table: treating it as one would digest
    ``from (select * from t where <inner filter>) t`` identically to the
    unfiltered ``from t``, silently dropping the inner filter on a routed
    answer. Those shapes return None -> undigestible -> pushdown (which is
    always correct)."""
    if _cls(node) != "SubqueryAlias":
        return None
    try:
        name = str(node.alias())
        probe = node.child()
        # transparent name layers allowed below the alias
        while _cls(probe) == "SubqueryAlias":
            probe = probe.child()
        # a View is a named registered relation — its body (including any
        # projection in the view definition) IS the table the name denotes
        if _cls(probe) in ("View", "LogicalRelation", "LocalRelation", "OneRowRelation"):
            return name
        return None
    except Exception:
        return None


def _walk_from(node, digest: SqlDigest) -> bool:
    """Walk the join/scan subtree below the aggregate; fill tables + joins."""
    cls = _cls(node)
    if cls == "SubqueryAlias":
        name = _relation_name(node)
        if name is None:
            return False
        digest.tables.add(name)
        return True
    if cls == "Join":
        jt = str(node.joinType().sql()).strip().upper()
        if jt not in ("INNER", "LEFT OUTER"):
            return False
        cond_opt = node.condition()
        if not cond_opt.isDefined():
            return False
        if not _walk_from(node.left(), digest) or not _walk_from(node.right(), digest):
            return False
        cond_sql = cond_opt.get().sql()
        pairs = _EQ_PAIR.findall(cond_sql)
        # Reject anything beyond a conjunction of qualified equalities.
        residue = _EQ_PAIR.sub("", cond_sql)
        if not pairs or re.search(r"[<>]|!=|\bOR\b|\bNOT\b", residue, re.IGNORECASE):
            return False
        by_tables: dict[tuple[str, str], list[tuple[str, str]]] = {}
        for lt, lc, rt, rc in pairs:
            by_tables.setdefault((lt, rt), []).append((lc, rc))
        for (lt, rt), cols in by_tables.items():
            digest.joins.append(
                JoinEdge(
                    left_table=lt,
                    right_table=rt,
                    left_cols=tuple(c[0] for c in cols),
                    right_cols=tuple(c[1] for c in cols),
                    join_type="inner" if jt == "INNER" else "left",
                )
            )
        return True
    return False


def extract_digest(df: DataFrame) -> SqlDigest | None:
    """Best-effort digest of ``df``'s analyzed plan.

    Recognized shape (top-down):
    ``[GlobalLimit/LocalLimit] [Sort] Aggregate [Filter] (Join*| Relation)``.
    Returns None for anything else — caller falls back to pushdown.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if _cls(plan) == "WithCTE":
            # WITH-clause queries: Catalyst keeps CTE defs as WithCTE/
            # CTERelationRef in the analyzed plan. Inline them (the same
            # InlineCTE rule the optimizer runs) so a cuboid-shaped query
            # spelled through a CTE still routes — the reference's Calcite
            # frontend inlines CTEs before planning, so its router never
            # sees them either. alwaysInline: digest is read-only, and
            # multi-referenced defs are fine to duplicate structurally.
            jvm = df.sparkSession._jvm
            plan = jvm.org.apache.spark.sql.catalyst.optimizer.InlineCTE(
                True, False
            ).apply(plan)
        return _extract(plan)
    except IntersectValueTypeError:
        raise  # contract violation, not a digest miss — never pushdown
    except Exception:
        return None


@dataclass
class JoinOfAggregates:
    """A join of two independently-digestible aggregate subqueries — the
    reference's multi-OLAPContext case: each star-join island accumulates
    its own OLAPContext and is routed to its own realization
    (OLAPContext.java:122-182 — one context per island; the enumerable join
    above runs on the already-served results). The funnel/compare dashboard
    shape: ``(routed agg A) join (routed agg B) on keys``."""

    left: SqlDigest
    right: SqlDigest
    join_type: str  # inner | left
    on: list[tuple[str, str]]  # (left output name, right output name)
    select: list[str]  # outer output names, in order
    sort: list[tuple[str, bool, bool]] = field(default_factory=list)
    limit: int | None = None
    #: ordered outer outputs: (name, None) = bare island column, (name, sql)
    #: = scalar expression over island columns re-run above the served join
    project: list[tuple[str, str | None]] | None = None
    #: window calls over the JOINED island outputs (OLAPWindowRel above the
    #: multi-context join — e.g. rank() over the compared cohorts), replayed
    #: with selectExpr like the single-context case; when present these
    #: carry the full output projection and ``project``/``select`` replay is
    #: skipped. ``pre_projects`` are projection layers Spark planned BELOW
    #: the window (scalar expressions the window inputs depend on) —
    #: replayed first, in plan order.
    window_exprs: list[list[tuple[str, str]]] = field(default_factory=list)
    window_projects: list[list[tuple[str, str]]] = field(default_factory=list)
    pre_projects: list[list[tuple[str, str]]] = field(default_factory=list)


def extract_join_digest(df: DataFrame) -> JoinOfAggregates | None:
    """Best-effort digest of ``[Limit] [Sort] Project(Join(aggA, aggB))``
    with disjoint output names and a conjunctive equality condition.
    Returns None for anything else — pushdown remains the fallback."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if _cls(plan) == "WithCTE":
            jvm = df.sparkSession._jvm
            plan = jvm.org.apache.spark.sql.catalyst.optimizer.InlineCTE(
                True, False
            ).apply(plan)
        return _extract_join(plan)
    except Exception:
        return None


def _unwrap_alias(node):
    while _cls(node) == "SubqueryAlias":
        node = node.child()
    return node


def _project_layer(pr) -> list[tuple[str, str]] | None:
    """One Project node -> replayable (output name, unqualified sql) list;
    None if any entry is neither an attribute nor a resolvable alias.
    Duplicate passthrough attrs (Spark emits them around windows) dedup."""
    layer: list[tuple[str, str]] = []
    seen: set[str] = set()
    for e in _seq(pr.projectList()):
        cls = _cls(e)
        if cls == "AttributeReference":
            name, psql = str(e.name()), f"`{e.name()}`"
        elif cls == "Alias":
            refs = _attr_names(e)
            usql = _unqualify(e.child().sql(), refs)
            if usql is None:
                return None
            name, psql = str(e.name()), usql
        else:
            return None
        if name in seen:
            continue
        seen.add(name)
        layer.append((name, psql))
    return layer


def _extract_join(plan) -> JoinOfAggregates | None:
    node = plan
    limit = None
    sort: list[tuple[str, bool]] = []
    if _cls(node) == "GlobalLimit":
        limit = int(node.limitExpr().sql())
        node = node.child()
        if _cls(node) == "LocalLimit":
            node = node.child()
    if _cls(node) == "Sort":
        for so in _seq(node.order()):
            entry = _sort_entry(so)
            if entry is None:
                return None
            sort.append(entry)
        node = node.child()
    if _cls(node) != "Project":
        return None
    # windows over the joined islands: Project+ over Window+ over Join —
    # capture projection layers + window groups exactly like the
    # single-context path and replay them above the served join
    probe = node
    projs = []
    while _cls(probe) == "Project":
        projs.append(probe)
        probe = probe.child()
    if projs and _cls(probe) == "Window":
        layers: list[list[tuple[str, str]]] = []
        for pr in projs:
            layer = _project_layer(pr)
            if layer is None:
                return None
            layers.append(layer)
        wgroups: list[list[tuple[str, str]]] = []
        while _cls(probe) == "Window":
            grp: list[tuple[str, str]] = []
            for e in _seq(probe.windowExpressions()):
                if _cls(e) != "Alias":
                    return None
                refs = _attr_names(e)
                usql = _unqualify(e.child().sql(), refs)
                if usql is None:
                    return None
                grp.append((str(e.name()), _fix_frame_sql(usql)))
            wgroups.append(grp)
            probe = probe.child()
        # Spark plans the window's INPUT expressions (e.g. the ratio the
        # query also selects) as Project layers BELOW the Window — captured
        # as pre-layers and replayed first, in plan order
        pre_layers: list[list[tuple[str, str]]] = []
        while _cls(probe) == "Project":
            layer = _project_layer(probe)
            if layer is None:
                return None
            pre_layers.append(layer)
            probe = probe.child()
        join = _unwrap_alias(probe)
        if _cls(join) != "Join":
            return None
        island = _join_island(join)
        if island is None:
            return None
        island.pre_projects = list(reversed(pre_layers))
        island.window_exprs = list(reversed(wgroups))
        island.window_projects = list(reversed(layers))
        island.sort = sort
        island.limit = limit
        return island
    entries = _seq(node.projectList())
    # outputs may be bare island columns OR scalar expressions over them
    # (``b.n / a.n as ratio`` — the compare-two-cohorts dashboard); the
    # expression is re-run verbatim above the served join
    select: list[str] = []
    exprs: list[tuple[str, str | None]] = []
    for e in entries:
        if _cls(e) == "AttributeReference":
            name = str(e.name())
            select.append(name)
            exprs.append((name, None))
        elif _cls(e) == "Alias":
            refs = _attr_names(e)
            usql = _unqualify(e.child().sql(), refs)
            if usql is None or re.search(r"\bover\s*\(", usql, re.IGNORECASE):
                return None  # window calls need their own ordering context
            select.extend(sorted(refs))
            exprs.append((str(e.name()), usql))
        else:
            return None
    out_names = [n for n, _ in exprs]
    if len(set(out_names)) != len(out_names):
        return None
    join = _unwrap_alias(node.child())
    if _cls(join) != "Join":
        return None
    island = _join_island(join)
    if island is None:
        return None
    if not set(select) <= set(island.select):
        return None
    island.project = exprs
    island.select = [n for n, _ in exprs]
    island.sort = sort
    island.limit = limit
    return island


def _island_names(x) -> list[str]:
    return x.select if isinstance(x, JoinOfAggregates) else [s.name for s in x.select]


def _join_island(join) -> JoinOfAggregates | None:
    """Digest a (possibly nested) Join of aggregate islands: each side is
    either a digestible aggregate or another Join — the reference's
    n-context case (every island still gets its own realization; the join
    tree above runs on served results)."""
    jt = str(join.joinType().sql()).strip().upper()
    if jt not in ("INNER", "LEFT OUTER"):
        return None
    cond_opt = join.condition()
    if not cond_opt.isDefined():
        return None

    def _side(n):
        n = _unwrap_alias(n)
        if _cls(n) == "Join":
            return _join_island(n)
        return _extract(n)

    left = _side(join.left())
    right = _side(join.right())
    if left is None or right is None:
        return None
    lnames = set(_island_names(left))
    rnames = set(_island_names(right))
    if (
        lnames & rnames
        or len(lnames) != len(_island_names(left))
        or len(rnames) != len(_island_names(right))
    ):
        return None  # ambiguous attribute names across/inside islands
    # names are unique across the islands (checked above), so table
    # qualifiers are redundant — strip them before matching equality pairs
    cond_sql = re.sub(r"\b\w+\.(?=\w)", "", cond_opt.get().sql().replace("`", ""))
    pairs = re.findall(r"\(?\s*(\w+)\s*=\s*(\w+)\s*\)?", cond_sql)
    residue = re.sub(r"\(?\s*\w+\s*=\s*\w+\s*\)?", "", cond_sql)
    if not pairs or residue.replace("AND", "").strip(" ()"):
        return None  # anything beyond conjunctive equality
    on: list[tuple[str, str]] = []
    for a, b in pairs:
        if a in lnames and b in rnames:
            on.append((a, b))
        elif b in lnames and a in rnames:
            on.append((b, a))
        else:
            return None
    return JoinOfAggregates(
        left=left, right=right, join_type="left" if jt == "LEFT OUTER" else "inner",
        on=on, select=_island_names(left) + _island_names(right),
    )


@dataclass
class UnionOfAggregates:
    """A set operation whose branches are each independently-digestible
    aggregate queries (reference OLAPUnionRel: each branch carries its own
    OLAPContext and realization; UnionPlan.scala:28-44 folds the served
    results — UNION-distinct adds the same final dedup Calcite adds, and
    INTERSECT/EXCEPT go beyond the reference, which pushes them down)."""

    children: list[SqlDigest]
    #: union_all | union_distinct | intersect | intersect_all |
    #: except_distinct | except_all
    op: str = "union_all"
    sort: list[tuple[str, bool, bool]] = field(default_factory=list)
    limit: int | None = None


def extract_union_digest(df: DataFrame) -> UnionOfAggregates | None:
    """Best-effort digest of ``[Limit] [Sort] <setop>(agg, agg, ...)`` where
    <setop> is Union, Distinct(Union), Intersect or Except."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if _cls(plan) == "WithCTE":
            jvm = df.sparkSession._jvm
            plan = jvm.org.apache.spark.sql.catalyst.optimizer.InlineCTE(
                True, False
            ).apply(plan)
        node = plan
        limit = None
        sort: list[tuple[str, bool]] = []
        if _cls(node) == "GlobalLimit":
            limit = int(node.limitExpr().sql())
            node = node.child()
            if _cls(node) == "LocalLimit":
                node = node.child()
        if _cls(node) == "Sort":
            for so in _seq(node.order()):
                entry = _sort_entry(so)
                if entry is None:
                    return None
                sort.append(entry)
            node = node.child()
        op = None
        if _cls(node) == "Distinct" and _cls(node.child()) == "Union":
            op = "union_distinct"
            node = node.child()
        elif _cls(node) == "Union":
            op = "union_all"
        elif _cls(node) in ("Intersect", "Except"):
            base = "intersect" if _cls(node) == "Intersect" else "except"
            all_form = bool(node.isAll())
            op = f"{base}_all" if all_form else (
                "intersect" if base == "intersect" else "except_distinct"
            )
        else:
            return None
        children = []
        for ch in _seq_children(node):
            d = _extract(_unwrap_alias(ch))
            if d is None or d.limit is not None or d.sort:
                return None  # per-branch sort/limit: rare, keep pushdown
            children.append(d)
        if len(children) < 2:
            return None
        width = len(children[0].select)
        if any(len(d.select) != width for d in children):
            return None
        return UnionOfAggregates(children=children, op=op, sort=sort, limit=limit)
    except Exception:
        return None


@dataclass
class AggOverUnion:
    """A final re-aggregation above a UNION ALL of routable aggregate
    islands — the year-over-year dashboard shape: ``select k, sum(v) from
    (agg-period-1 union all agg-period-2) group by k``. Each branch routes
    to its own cuboid; the outer aggregate then runs over the served union
    (tiny input), exactly like the reference's final Calcite aggregate over
    per-context results."""

    base: UnionOfAggregates
    group_cols: list[str]
    #: ordered outputs: (name, None) for a group passthrough, (name, sql)
    #: for an aggregate expression over the union's output columns
    select: list[tuple[str, str | None]]
    sort: list[tuple[str, bool, bool]] = field(default_factory=list)
    limit: int | None = None


def extract_agg_over_union(df: DataFrame) -> AggOverUnion | None:
    """Best-effort digest of ``[Limit] [Sort] Aggregate(Union(agg, ...))``.
    The outer aggregate needs no routing semantics of its own — it is
    re-executed verbatim over the served union, so any aggregate expression
    Spark can parse is acceptable."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if _cls(plan) == "WithCTE":
            jvm = df.sparkSession._jvm
            plan = jvm.org.apache.spark.sql.catalyst.optimizer.InlineCTE(
                True, False
            ).apply(plan)
        node = plan
        limit = None
        sort: list[tuple[str, bool]] = []
        if _cls(node) == "GlobalLimit":
            limit = int(node.limitExpr().sql())
            node = node.child()
            if _cls(node) == "LocalLimit":
                node = node.child()
        if _cls(node) == "Sort":
            for so in _seq(node.order()):
                entry = _sort_entry(so)
                if entry is None:
                    return None
                sort.append(entry)
            node = node.child()
        if _cls(node) != "Aggregate":
            return None
        union = _unwrap_alias(node.child())
        if _cls(union) != "Union":
            return None
        group_cols: list[str] = []
        for g in _seq(node.groupingExpressions()):
            if _cls(g) != "AttributeReference":
                return None
            group_cols.append(str(g.name()))
        select: list[tuple[str, str | None]] = []
        for e in _seq(node.aggregateExpressions()):
            if _cls(e) == "AttributeReference":
                if str(e.name()) not in group_cols:
                    return None
                select.append((str(e.name()), None))
            elif _cls(e) == "Alias":
                refs = _attr_names(e)
                usql = _unqualify(e.child().sql(), refs)
                if usql is None:
                    return None
                select.append((str(e.name()), usql))
            else:
                return None
        children = []
        for ch in _seq_children(union):
            d = _extract(_unwrap_alias(ch))
            if d is None or d.limit is not None or d.sort:
                return None
            children.append(d)
        if len(children) < 2:
            return None
        width = len(children[0].select)
        if any(len(c.select) != width for c in children):
            return None
        base = UnionOfAggregates(children=children, op="union_all")
        return AggOverUnion(
            base=base, group_cols=group_cols, select=select, sort=sort, limit=limit
        )
    except Exception:
        return None


def _seq_children(node) -> list:
    it = node.children().iterator()
    out = []
    while it.hasNext():
        out.append(it.next())
    return out


def _apply_outer_projection(digest: SqlDigest, outer_cols: list[str] | None):
    """Apply a recorded reorder/subset projection (``select s, rf from t``
    over an inlined CTE body) to the digest's select list. Group columns
    stay grouped even when dropped from the output (plain projection
    semantics); windowed digests refuse — the outer projection applies
    ABOVE the window layers, which the router replays last."""
    if outer_cols is None:
        return digest
    if digest.window_exprs or digest.window_projects or digest.hidden:
        return None
    by_name = {s.name: s for s in digest.select}
    if not set(outer_cols) <= set(by_name):
        return None
    digest.select = [by_name[n] for n in outer_cols]
    return digest


def _extract(plan) -> SqlDigest | None:  # noqa: C901 — one dispatch walk
    digest = SqlDigest(tables=set(), joins=[], group_cols=[])

    node = plan
    # LIMIT appears as GlobalLimit(LocalLimit(child))
    if _cls(node) == "GlobalLimit":
        digest.limit = int(node.limitExpr().sql())
        node = node.child()
        if _cls(node) == "LocalLimit":
            node = node.child()
    if _cls(node) == "Sort":
        for so in _seq(node.order()):
            entry = _sort_entry(so)
            if entry is None:
                return None
            digest.sort.append(entry)
        node = node.child()
    # Window functions over the aggregate: Project+ over Window+ over
    # [Filter] Aggregate (Spark stacks one Window node per distinct window
    # spec and adds hidden `_w0`-style aggregate outputs the windows order
    # by). Windows are pure post-processing of the aggregate's result rows,
    # so they never affect WHICH cuboid can serve the query — the router
    # replays them with selectExpr above the routed aggregate
    # (OLAPWindowRel parity: windows sit above OLAPAggregateRel).
    # Inlined-CTE passthrough: ``with t as (<agg>) select * from t``
    # inlines to an exact-passthrough Project over SubqueryAlias over the
    # CTE body. Both layers are transparent — same columns, same order —
    # so skip them and digest the body. Anything that reorders, drops or
    # computes columns fails the passthrough check and stays undigestible.
    outer_cols: list[str] | None = None
    while _cls(node) == "Project":
        inner = node.child()
        hops = 0
        while _cls(inner) == "SubqueryAlias":
            inner = inner.child()
            hops += 1
        if hops == 0 or _cls(inner) in (
            "View",
            "LogicalRelation",
            "LocalRelation",
            "OneRowRelation",
        ):
            break  # a real table alias — the scan walk handles it
        entries = _seq(node.projectList())
        if not all(_cls(e) == "AttributeReference" for e in entries):
            break
        names = [str(e.name()) for e in entries]
        inner_names = [str(a.name()) for a in _seq(inner.output())]
        if names == inner_names:
            node = inner
            continue
        # a pure reorder/subset of the body's outputs (``select s, rf from
        # t``): record it once and apply to the digest's select list at the
        # end — still only attribute references, so nothing is computed
        if (
            outer_cols is None
            and len(set(names)) == len(names)
            and set(names) <= set(inner_names)
        ):
            outer_cols = names
            node = inner
            continue
        break

    probe = node
    projs = []
    while _cls(probe) == "Project":
        projs.append(probe)
        probe = probe.child()
    if projs and _cls(probe) == "Window":
        layers: list[list[tuple[str, str]]] = []
        for pr in projs:
            layer: list[tuple[str, str]] = []
            seen: set[str] = set()
            for e in _seq(pr.projectList()):
                cls = _cls(e)
                if cls == "AttributeReference":
                    name, sql = str(e.name()), f"`{e.name()}`"
                elif cls == "Alias":
                    refs = _attr_names(e)
                    usql = _unqualify(e.child().sql(), refs)
                    if usql is None:
                        return None
                    name, sql = str(e.name()), usql
                else:
                    return None
                if name in seen:  # Spark emits duplicate passthrough attrs
                    continue
                seen.add(name)
                layer.append((name, sql))
            layers.append(layer)
        wgroups: list[list[tuple[str, str]]] = []
        while _cls(probe) == "Window":
            grp: list[tuple[str, str]] = []
            for e in _seq(probe.windowExpressions()):
                if _cls(e) != "Alias":
                    return None
                refs = _attr_names(e)
                usql = _unqualify(e.child().sql(), refs)
                if usql is None:
                    return None
                grp.append((str(e.name()), _fix_frame_sql(usql)))
            wgroups.append(grp)
            probe = probe.child()
        if _cls(probe) not in ("Aggregate", "Filter"):
            return None  # window over a non-aggregate: plain Spark handles it
        # evaluation order is bottom-up: innermost Window first, then the
        # projection layers from the inside out
        digest.window_exprs = list(reversed(wgroups))
        digest.window_projects = list(reversed(layers))
        node = probe

    # HAVING over aggregates NOT in the select list: Spark plans
    # Project[visible] over Filter[hidden-agg refs] over Aggregate[... +
    # hidden aliases]. Record the visible set; the hidden aggregate outputs
    # become regular (routable) select items renamed to safe __h* aliases
    # and dropped after the post-aggregation filter.
    visible: list[str] | None = None
    if (
        _cls(node) == "Project"
        and _cls(node.child()) == "Filter"
        and _cls(node.child().child()) == "Aggregate"
    ):
        entries = _seq(node.projectList())
        if not all(_cls(e) == "AttributeReference" for e in entries):
            return None
        visible = [e.name() for e in entries]
        node = node.child()
    # HAVING: a Filter sitting directly above the Aggregate whose condition
    # references only select-output attributes (Spark resolves `having
    # sum(x) > k` onto the matching select alias when one exists; aggs not
    # in the select list create the extended shape handled above).
    if _cls(node) == "Filter" and _cls(node.child()) == "Aggregate":
        cond = node.condition()
        refs = _attr_names(cond)
        sql = _unqualify(cond.sql(), refs)
        if sql is None:
            return None
        digest.having_sql = sql
        digest.having_cols = refs
        node = node.child()
    # SELECT DISTINCT cols: analyzed as Distinct(Project(...)) — digest it as
    # a group-by over the projected columns with no aggregate outputs (the
    # optimizer performs the same Distinct->Aggregate conversion).
    if _cls(node) == "Distinct":
        proj = node.child()
        if _cls(proj) != "Project":
            return None
        for e in _seq(proj.projectList()):
            if _cls(e) == "AttributeReference":
                digest.group_cols.append(e.name())
                digest.select.append(SelectItem(name=e.name(), group_col=e.name()))
            elif _cls(e) == "Alias" and _cls(e.child()) == "AttributeReference":
                digest.group_cols.append(e.child().name())
                digest.select.append(SelectItem(name=e.name(), group_col=e.child().name()))
            else:
                return None
        node = proj.child()
        if _cls(node) == "Filter":
            cond = node.condition()
            digest.filter_cols = _attr_names(cond)
            sql = _unqualify(cond.sql(), digest.filter_cols)
            if sql is None:
                return None
            digest.filter_sql = sql
            node = node.child()
        if not _walk_from(node, digest):
            return None
        return _apply_outer_projection(digest, outer_cols)

    if _cls(node) != "Aggregate":
        return None

    agg_node = node
    below = agg_node.child()
    gexprs = _seq(agg_node.groupingExpressions())
    if gexprs and _cls(below) == "Expand" and gexprs[-1].name() == "spark_grouping_id":
        # ROLLUP / CUBE / GROUPING SETS: Spark plans these as
        # Aggregate(groups + spark_grouping_id) over Expand(one projection
        # per grouping set) over a duplication Project. Decode the sets from
        # each projection's trailing grouping-id literal (bit n-1-k set =>
        # column k aggregated away in that set).
        for g in gexprs[:-1]:
            if _cls(g) != "AttributeReference":
                return None
            digest.group_cols.append(g.name())
        n = len(digest.group_cols)
        digest.grouping_sets = []
        for proj in _seq(below.projections()):
            exprs = _seq(proj)
            try:
                gid = int(exprs[-1].toString())
            except ValueError:
                return None
            digest.grouping_sets.append(
                [c for k, c in enumerate(digest.group_cols) if not (gid >> (n - 1 - k)) & 1]
            )
        below = below.child()
        # the duplication Project only re-aliases attributes — skip it
        if _cls(below) == "Project" and all(
            _cls(e) == "AttributeReference"
            or (_cls(e) == "Alias" and _cls(e.child()) == "AttributeReference")
            for e in _seq(below.projectList())
        ):
            below = below.child()
    else:
        # Group-by columns: plain attributes, or deterministic scalar
        # expressions over attributes (``group by month(d)`` — any pure
        # function of dim columns re-groups exactly from the layout's
        # distinct dim values; the reference's time hierarchies are the
        # special case it materializes as extra dimensions).
        for g in gexprs:
            if _cls(g) == "AttributeReference":
                digest.group_cols.append(g.name())
                continue
            refs = _attr_names(g)
            gsql = _unqualify(g.sql(), refs) if refs else None
            if gsql is None:
                return None
            gname = f"__g{len(digest.group_exprs)}"
            digest.group_exprs[gname] = (gsql, frozenset(refs))
            digest.group_cols.append(gname)

    # Select list.
    for e in _seq(agg_node.aggregateExpressions()):
        cls = _cls(e)
        if cls == "AttributeReference":
            if e.name() not in digest.group_cols:
                return None
            digest.select.append(SelectItem(name=e.name(), group_col=e.name()))
            continue
        if cls != "Alias":
            return None
        alias = e.name()
        child = e.child()
        child_sql = child.sql()
        if digest.grouping_sets is not None and _attr_names(child) == {
            "spark_grouping_id"
        }:
            gm = re.fullmatch(
                r"CAST\(\(shiftright\(spark_grouping_id, (\d+)\) & 1L?\) AS TINYINT\)",
                child_sql.replace("`", ""),
                re.IGNORECASE,
            )
            if gm is None:
                return None  # grouping_id()/other indicator forms: pushdown
            k = int(gm.group(1))
            n = len(digest.group_cols)
            if not 0 <= n - 1 - k < n:
                return None
            digest.select.append(
                SelectItem(name=alias, grouping_of=digest.group_cols[n - 1 - k])
            )
            continue
        m = _AGG_RE.match(child_sql)
        if not m:
            # aliased group column?
            if _cls(child) == "AttributeReference" and child.name() in digest.group_cols:
                digest.select.append(SelectItem(name=alias, group_col=child.name()))
                continue
            # selected grouping EXPRESSION (same resolved sql as a grouping
            # expr => same synthesized name)
            if digest.group_exprs:
                refs = _attr_names(child)
                usql = _unqualify(child_sql, refs) if refs else None
                gname = next(
                    (n for n, (gs, _) in digest.group_exprs.items() if gs == usql),
                    None,
                )
                if gname is not None:
                    digest.select.append(SelectItem(name=alias, group_col=gname))
                    continue
            pm = _PCT_RE.match(child_sql.replace("`", ""))
            if pm and len(_attr_names(child)) == 1:
                digest.select.append(
                    SelectItem(
                        name=alias,
                        agg=AggCall(
                            func="PERCENTILE",
                            column=pm.group(1).split(".")[-1],
                            distinct=False,
                            alias=alias,
                            q=float(pm.group(2)),
                        ),
                    )
                )
                continue
            ic = _intersect_call(child)
            if ic is not None:
                ifunc, vcol, fcol, vals = ic
                digest.select.append(
                    SelectItem(
                        name=alias,
                        agg=AggCall(
                            func=ifunc,
                            column=vcol,
                            distinct=False,
                            alias=alias,
                            filter_col=fcol,
                            values=vals,
                        ),
                    )
                )
                continue
            return None
        func = m.group(1).upper()
        distinct = bool(m.group(2))
        arg = m.group(3).strip()
        refs = _attr_names(child)
        expr_canon = None
        cond_sql = None
        cond_cols: frozenset[str] = frozenset()
        multi_cols: tuple[str, ...] = ()
        if arg == "1" and func == "COUNT":
            col = None
        elif len(refs) == 1 and _QUALIFIED.fullmatch(arg):
            col = arg.split(".")[-1]
        elif (
            distinct
            and func == "COUNT"
            and "," in arg
            and all(_QUALIFIED.fullmatch(p.strip()) for p in arg.split(","))
        ):
            # multi-column count(distinct a, b): distinct tuples over rows
            # where EVERY column is non-null (SQL semantics)
            col = None
            multi_cols = tuple(p.strip().split(".")[-1] for p in arg.split(","))
        elif distinct and func == "COUNT" and (cm := _CASE_DISTINCT_RE.match(arg)):
            # conditional distinct — the per-cohort INTERSECT_COUNT spelling:
            # count(distinct case when <cond over dims> then col end)
            cond_raw = cm.group(1)
            col = cm.group(2).replace("`", "").split(".")[-1]
            cond_cols = frozenset(mm.group(2) for mm in _QUALIFIED.finditer(cond_raw))
            cond_sql = _unqualify(cond_raw.replace("`", ""), cond_cols)
            if cond_sql is None or not cond_cols:
                return None
        elif not distinct and refs:
            # agg over an expression: keep its canonical form so the router
            # can match it against a declared computed-column measure
            col = None
            expr_canon = canonical_expr_sql(arg)
        else:
            return None
        if distinct and func != "COUNT":
            return None
        digest.select.append(
            SelectItem(
                name=alias,
                agg=AggCall(
                    func=func,
                    column=col,
                    distinct=distinct,
                    alias=alias,
                    expr_sql=expr_canon,
                    cond_sql=cond_sql,
                    cond_cols=cond_cols,
                    columns=multi_cols,
                ),
            )
        )

    if visible is not None:
        # rename hidden aggregate outputs (auto-aliases like `count(1)`) to
        # safe identifiers, rewriting the HAVING condition to match, and
        # mark them for post-filter removal
        vis = set(visible)
        renames: dict[str, str] = {}
        for i, item in enumerate(digest.select):
            if item.name in vis:
                continue
            if item.agg is None:
                return None  # hidden plain column: unexpected shape
            safe = f"__h{i}"
            renames[item.name] = safe
            item.agg.alias = safe
            item.name = safe
            digest.hidden.append(safe)
        if digest.having_sql is not None:
            for orig, safe in renames.items():
                digest.having_sql = digest.having_sql.replace(f"`{orig}`", safe)
            digest.having_cols = {renames.get(c, c) for c in digest.having_cols}
        if "`" in (digest.having_sql or ""):
            return None  # unrewritten quoted reference — refuse to guess

    node = below
    if _cls(node) == "Filter":
        cond = node.condition()
        digest.filter_cols = _attr_names(cond)
        sql = _unqualify(cond.sql(), digest.filter_cols)
        if sql is None:
            return None
        digest.filter_sql = sql
        node = node.child()

    if not _walk_from(node, digest):
        return None
    return _apply_outer_projection(digest, outer_cols)
