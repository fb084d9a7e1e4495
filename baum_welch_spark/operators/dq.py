"""Data-quality validation: declarative constraint checks as ONE scan pass.

The gate a production pipeline runs on every ingest before data reaches
training or a snapshot merge — at 100 TB a constraint sweep must not cost
one job per rule. Beyond-reference surface (the reference validates only
its model file, ``BaumWelchUtils.validate`` per SURVEY §2.4 D5); this is
the table-level counterpart, same family as ``quality.doc_quality`` for
documents.

Rule forms (each a dict):

- ``{"rule": "not_null", "col": c}`` — NULL count;
- ``{"rule": "range", "col": c, "min": x, "max": y}`` — values outside
  [min, max] (either bound optional; NULLs are not range violations —
  they're the not_null rule's job);
- ``{"rule": "in_set", "col": c, "values": [...]}`` — values outside the
  allowed set (NULLs excluded likewise);
- ``{"rule": "unique", "col": c}`` — rows beyond the first per duplicated
  value (count - distinct count, the surplus rows a MERGE would misbehave
  on);
- ``{"rule": "fk", "col": c, "ref": df, "ref_col": r}`` — orphaned foreign
  keys (left-anti join against the referenced key set; NULLs excluded).

Execution shape: every row-level rule (not_null/range/in_set) compiles to
one conditional-sum column of a SINGLE aggregate over one scan — adding a
rule adds an expression, not a pass. ``unique`` adds count+countDistinct to
the same aggregate (Spark plans the distinct as an expand, still one scan).
Each ``fk`` is one anti-join whose probe side carries only the key column
(column-pruned scan; the ref side is its distinct key set, typically
broadcast). Output: (rule, col, n_violations, n_rows, violation_rate),
one row per rule, ordered by (rule, col).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROW_LEVEL = ("not_null", "range", "in_set")


def _violation_expr(rule: Mapping[str, Any]):
    c = F.col(rule["col"])
    kind = rule["rule"]
    if kind == "not_null":
        return c.isNull()
    if kind == "range":
        lo, hi = rule.get("min"), rule.get("max")
        if lo is None and hi is None:
            raise ValueError(f"range rule on {rule['col']} needs min and/or max")
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (c < F.lit(lo))
        if hi is not None:
            cond = cond | (c > F.lit(hi))
        return c.isNotNull() & cond
    if kind == "in_set":
        vals = rule.get("values")
        if not vals:
            raise ValueError(f"in_set rule on {rule['col']} needs values")
        return c.isNotNull() & ~c.isin(list(vals))
    raise ValueError(f"unknown row-level rule {kind!r}")


def dq_report(df: DataFrame, rules: Sequence[Mapping[str, Any]]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; see the module docstring for the
    rule forms and the one-scan execution shape."""
    if not rules:
        raise ValueError("rules must contain at least one rule")
    aggs = [F.count(F.lit(1)).alias("__n")]
    labels: list[tuple[str, str, str]] = []  # (rule, col, agg alias)
    fks: list[Mapping[str, Any]] = []
    for i, rule in enumerate(rules):
        kind = rule["rule"]
        if kind in _ROW_LEVEL:
            alias = f"__v{i}"
            aggs.append(
                F.sum(F.when(_violation_expr(rule), 1).otherwise(0))
                .cast("bigint")
                .alias(alias)
            )
            labels.append((kind, rule["col"], alias))
        elif kind == "unique":
            alias = f"__v{i}"
            c = F.col(rule["col"])
            # surplus rows past the first per duplicated value; NULL rows are
            # excluded on both sides (not_null's concern, and COUNT(c)
            # already skips them)
            aggs.append(
                (F.count(c) - F.count_distinct(c)).cast("bigint").alias(alias)
            )
            labels.append((kind, rule["col"], alias))
        elif kind == "fk":
            fks.append(rule)
        else:
            raise ValueError(f"unknown rule {kind!r}")

    # Run the single row-level aggregate ONCE and collect its one bounded
    # row (#rules+1 scalars). Referencing the agg frame lazily from every
    # rule's select — and cross-joining it into every fk branch — re-ran
    # the full scan (including the count_distinct expand) once per rule;
    # with k rules the documented one-scan contract became k extra scans.
    base = df.agg(*aggs).first()
    n_rows = int(base["__n"])
    # conditional sums over an EMPTY table are NULL, not 0 — an empty
    # input has zero violations (and violation_rate stays NULL from 0/0)
    report: list[tuple[str, str, int]] = [
        (kind, col, int(base[alias] or 0)) for kind, col, alias in labels
    ]
    for rule in fks:
        col, ref, ref_col = rule["col"], rule["ref"], rule["ref_col"]
        keys = ref.select(F.col(ref_col).alias("__k")).distinct()
        orphan_count = (
            df.select(F.col(col))
            .filter(F.col(col).isNotNull())
            .join(keys, F.col(col) == F.col("__k"), "left_anti")
            .count()
        )
        report.append(("fk", col, int(orphan_count)))
    out = df.sparkSession.createDataFrame(
        [(r, c, v, n_rows) for r, c, v in report],
        "rule string, col string, n_violations bigint, n_rows bigint",
    ).withColumn(
        # rate computed Spark-side (not Python round) so HALF_UP rounding
        # matches the DuckDB oracle; the n_rows > 0 guard makes the empty
        # table NULL regardless of ANSI mode (ANSI 0/0 throws, non-ANSI
        # returns NULL — this pins the oracle's NULL either way)
        "violation_rate",
        F.when(
            F.col("n_rows") > 0,
            F.round(F.col("n_violations") / F.col("n_rows"), 6),
        ),
    )
    return out.orderBy("rule", "col")


def dq_report_sql(table: str, rules: Sequence[Mapping[str, Any]]) -> str:
    """DuckDB-exact oracle for :func:`dq_report`: the same conditional sums
    in one aggregate plus one NOT-IN-keys scalar per fk rule. ``ref`` in fk
    rules must be the referenced TABLE NAME for the SQL side."""

    def lit(v: Any) -> str:
        return f"'{v}'" if isinstance(v, str) else repr(v)

    selects = []
    for rule in rules:
        kind, col = rule["rule"], rule["col"]
        if kind == "not_null":
            v = f"CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        elif kind == "range":
            conds = []
            if rule.get("min") is not None:
                conds.append(f"{col} < {lit(rule['min'])}")
            if rule.get("max") is not None:
                conds.append(f"{col} > {lit(rule['max'])}")
            v = (
                f"CAST(sum(CASE WHEN {col} IS NOT NULL AND ({' OR '.join(conds)}) "
                f"THEN 1 ELSE 0 END) AS BIGINT)"
            )
        elif kind == "in_set":
            vals = ", ".join(lit(x) for x in rule["values"])
            v = (
                f"CAST(sum(CASE WHEN {col} IS NOT NULL AND {col} NOT IN ({vals}) "
                f"THEN 1 ELSE 0 END) AS BIGINT)"
            )
        elif kind == "unique":
            v = f"CAST(count({col}) - count(DISTINCT {col}) AS BIGINT)"
        elif kind == "fk":
            ref, ref_col = rule["ref"], rule["ref_col"]
            v = (
                f"CAST((SELECT count(*) FROM {table} t WHERE t.{col} IS NOT NULL "
                f"AND t.{col} NOT IN (SELECT {ref_col} FROM {ref} "
                f"WHERE {ref_col} IS NOT NULL)) AS BIGINT)"
            )
        else:
            raise ValueError(f"unknown rule {kind!r}")
        selects.append(
            f"""SELECT '{kind if kind != 'fk' else 'fk'}' AS rule, '{col}' AS col,
       {v} AS n_violations,
       CAST(count(*) AS BIGINT) AS n_rows,
       round({v} * 1.0 / count(*), 6) AS violation_rate
FROM {table}"""
        )
    return "\nUNION ALL\n".join(selects) + "\nORDER BY rule, col"
