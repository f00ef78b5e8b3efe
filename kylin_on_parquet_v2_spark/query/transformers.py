"""SQL massage: a pluggable transformer chain applied before analysis.

Reference parity: ``query/.../util/QueryUtil.massageSql`` :75-122 — an
``IQueryTransformer`` chain (:139-160) whose defaults strip BI-client
artifacts (``DefaultQueryTransformer``: ODBC ``{fn ...}`` escapes and
friends, the stuff Tableau emits) plus a forced row-limit append
(``appendLimitOffsetToSql`` :49-73) so an unbounded SELECT cannot pull an
entire table through the driver.

A transformer is any ``Callable[[str], str]``; the engine applies them in
order. Transformations here are textual by design — they run BEFORE Spark
parses the query, exactly like the reference's chain runs before Calcite.
"""

from __future__ import annotations

import re
from collections.abc import Callable

QueryTransformer = Callable[[str], str]


def strip_trailing_semicolon(sql: str) -> str:
    return sql.strip().rstrip(";").strip()


_FN_ESCAPE = re.compile(r"\{\s*fn\s+([^{}]+?)\s*\}", re.IGNORECASE)
_TS_ESCAPE = re.compile(r"\{\s*ts\s+('[^']*')\s*\}", re.IGNORECASE)
_D_ESCAPE = re.compile(r"\{\s*d\s+('[^']*')\s*\}", re.IGNORECASE)


def unwrap_odbc_escapes(sql: str) -> str:
    """``{fn LCASE(x)}`` -> ``LCASE(x)``, ``{d '2024-01-01'}`` ->
    ``DATE '2024-01-01'``, ``{ts '...'}`` -> ``TIMESTAMP '...'`` — the ODBC
    escape syntax BI clients emit (DefaultQueryTransformer parity).
    Innermost-first so nested ``{fn ...{fn ...}...}`` unwraps fully."""
    prev = None
    while prev != sql:
        prev = sql
        sql = _FN_ESCAPE.sub(lambda m: m.group(1), sql)
    sql = _TS_ESCAPE.sub(lambda m: f"TIMESTAMP {m.group(1)}", sql)
    sql = _D_ESCAPE.sub(lambda m: f"DATE {m.group(1)}", sql)
    return sql


_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def quote_identifiers_to_backticks(sql: str) -> str:
    """ANSI double-quoted identifiers -> Spark backticks (the dialect
    Tableau and other BI clients emit — reference corpus ``sql_tableau/``;
    QueryUtil's converter chain does the same normalization).

    Token-walks the text so double quotes inside single-quoted string
    literals are left alone, and only converts a double-quoted token that
    actually looks like an identifier — doubled-quote escape sequences
    inside quoted tokens never parse as one and pass through untouched."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":  # single-quoted literal: copy verbatim, '' escapes
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
        elif ch == '"':
            j = i + 1
            body: list[str] = []
            while j < n:
                if sql[j] == '"':
                    if j + 1 < n and sql[j + 1] == '"':
                        body.append('"')
                        j += 2
                        continue
                    break
                body.append(sql[j])
                j += 1
            token = "".join(body)
            if j < n and _IDENT.match(token):
                out.append(f"`{token}`")
            else:  # not an identifier (or unterminated): leave as-is
                out.append(sql[i : j + 1])
            i = j + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


_HAS_LIMIT = re.compile(r"\blimit\s+\d+", re.IGNORECASE)
_IS_SELECT = re.compile(r"^\s*(select|with)\b", re.IGNORECASE)


class ForcedLimitTransformer:
    """Append ``LIMIT max_rows`` to an unbounded SELECT
    (appendLimitOffsetToSql parity — result sets are driver-bound)."""

    def __init__(self, max_rows: int):
        self.max_rows = max_rows

    def __call__(self, sql: str) -> str:
        if _IS_SELECT.match(sql) and not _HAS_LIMIT.search(sql):
            return f"{sql}\nLIMIT {self.max_rows}"
        return sql


def default_transformers(max_result_rows: int | None = None) -> list[QueryTransformer]:
    chain: list[QueryTransformer] = [
        strip_trailing_semicolon,
        unwrap_odbc_escapes,
        quote_identifiers_to_backticks,
    ]
    if max_result_rows is not None:
        chain.append(ForcedLimitTransformer(max_result_rows))
    return chain
