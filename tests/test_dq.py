"""dq_report: declarative constraint checks in one scan pass."""

import pytest

from baum_welch_spark.operators.dq import dq_report, dq_report_sql
from baum_welch_spark.plans.audit import plan_report


@pytest.fixture(scope="module")
def messy(spark):
    # one NULL key, one duplicate key, one negative value, one bad status,
    # one orphan fk — every rule kind has exactly one planted violation
    return spark.createDataFrame(
        [
            (1, 10, "O", 5.0),
            (2, 10, "O", -1.0),   # range violation (min 0)
            (2, 20, "F", 7.0),    # duplicate key
            (None, 30, "O", 8.0), # null key
            (5, 99, "X", 9.0),    # bad status + orphan custkey
        ],
        "k bigint, ck bigint, st string, v double",
    )


@pytest.fixture(scope="module")
def refkeys(spark):
    return spark.createDataFrame([(10,), (20,), (30,)], "c bigint")


def rules(refkeys):
    return [
        {"rule": "not_null", "col": "k"},
        {"rule": "unique", "col": "k"},
        {"rule": "range", "col": "v", "min": 0.0},
        {"rule": "in_set", "col": "st", "values": ["O", "F"]},
        {"rule": "fk", "col": "ck", "ref": refkeys, "ref_col": "c"},
    ]


def test_dq_report_counts_each_planted_violation(spark, messy, refkeys):
    got = {(r.rule, r.col): r.n_violations for r in dq_report(messy, rules(refkeys)).collect()}
    assert got == {
        ("not_null", "k"): 1,
        ("unique", "k"): 1,
        ("range", "v"): 1,
        ("in_set", "st"): 1,
        ("fk", "ck"): 1,
    }


def test_dq_report_null_is_not_a_range_or_set_violation(spark):
    df = spark.createDataFrame([(None,), (5,)], "v int")
    got = dq_report(
        df,
        [{"rule": "range", "col": "v", "min": 0, "max": 10},
         {"rule": "in_set", "col": "v", "values": [5]}],
    ).collect()
    assert all(r.n_violations == 0 for r in got)  # NULLs are not_null's job


def test_dq_report_rejects_malformed_rules(spark, messy):
    with pytest.raises(ValueError, match="min and/or max"):
        dq_report(messy, [{"rule": "range", "col": "v"}]).collect()
    with pytest.raises(ValueError, match="unknown rule"):
        dq_report(messy, [{"rule": "regex", "col": "v"}])
    with pytest.raises(ValueError, match="at least one"):
        dq_report(messy, [])


def test_dq_report_row_rules_are_one_aggregate(spark, messy):
    """Scale contract: N row-level rules must not cost N scans — the plan
    has no join at all without fk rules, and adding rules adds expressions."""
    rep = plan_report(
        dq_report(
            messy,
            [{"rule": "not_null", "col": "k"},
             {"rule": "range", "col": "v", "min": 0.0},
             {"rule": "in_set", "col": "st", "values": ["O"]}],
        )
    )
    assert rep["nested_loop_joins"] == 0, rep


def test_dq_report_sql_matches_spark_on_duckdb(spark, messy, refkeys, tmp_path):
    import duckdb

    messy.toPandas().to_parquet(str(tmp_path / "t.parquet"))
    refkeys.toPandas().to_parquet(str(tmp_path / "r.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{tmp_path}/t.parquet'")
    con.sql(f"CREATE VIEW r AS SELECT * FROM '{tmp_path}/r.parquet'")
    sql_rules = [dict(x, ref="r") if x["rule"] == "fk" else x for x in rules(refkeys)]
    want = [tuple(x) for x in con.sql(dq_report_sql("t", sql_rules)).fetchall()]
    got = [tuple(x) for x in dq_report(messy, rules(refkeys)).collect()]
    assert got == want


def test_dq_report_empty_table_reports_zero_violations(spark):
    """Conditional sums over an empty table are NULL in Spark; the report
    must still come back with 0 violations per rule (n_rows 0,
    violation_rate NULL from 0/0) instead of crashing — the r11 eager
    one-scan rewrite int()s the collected scalars."""
    empty = spark.createDataFrame([], "k bigint, v double, st string")
    ref = spark.createDataFrame([(1,)], "rk bigint")
    rows = dq_report(
        empty,
        [
            {"rule": "not_null", "col": "k"},
            {"rule": "range", "col": "v", "min": 0.0},
            {"rule": "in_set", "col": "st", "values": ["O"]},
            {"rule": "unique", "col": "k"},
            {"rule": "fk", "col": "k", "ref": ref, "ref_col": "rk"},
        ],
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_violations == 0
        assert r.n_rows == 0
        assert r.violation_rate is None
