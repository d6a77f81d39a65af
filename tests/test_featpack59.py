"""Semantic tests for feature-eng pack #59: the Spark 4 SQL surface
(SQL scalar/table UDFs, pipe syntax, session variables, EXECUTE
IMMEDIATE + IDENTIFIER binding, GROUP BY ALL) — brute pandas replicas
plus plan pins proving the sugar is zero-cost (no Python UDF node,
identical desugared plans)."""

from __future__ import annotations

import pandas as pd

from crawlfe.queries import (
    q_sql_exec_immediate,
    q_sql_groupby_all,
    q_sql_pipe_funnel,
    q_sql_session_var,
    q_sql_udf_scalar,
    q_sql_udf_table,
)

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def test_sql_udf_scalar_brute(spark):
    out = (
        q_sql_udf_scalar(spark, SF)
        .toPandas()
        .set_index(["event_type", "band"])
    )
    ev = _events()
    ev["band"] = pd.cut(
        ev["value"],
        [-float("inf"), 10, 100, float("inf")],
        labels=["low", "mid", "high"],
        right=False,
    )
    for (et, band), grp in ev.groupby(
        ["event_type", "band"], observed=True
    ):
        if len(grp) == 0:
            continue
        row = out.loc[(et, band)]
        assert row["n"] == len(grp)
        assert row["value_cents"] == int(
            grp["value"].mul(100).round().astype("int64").sum()
        )


def test_sql_udf_scalar_is_inlined(spark):
    """The SQL UDF must compile to pure JVM expressions — zero Python
    eval nodes in the plan (the whole point vs a Python UDF)."""
    plan = (
        q_sql_udf_scalar(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


def test_sql_udf_table_brute(spark):
    out = q_sql_udf_table(spark, SF).toPandas().set_index("d")
    ev = _events()
    clicks = ev[ev.event_type == "click"].copy()
    clicks["d"] = (
        clicks["ts"].dt.normalize() - pd.Timestamp("1970-01-01")
    ).dt.days
    for d, grp in clicks.groupby("d"):
        row = out.loc[d]
        assert row["n_events"] == len(grp)
        assert row["n_users"] == grp["user_id"].nunique()
        assert abs(
            row["events_per_user"]
            - round(len(grp) / grp["user_id"].nunique(), 6)
        ) < 1e-9


def test_sql_pipe_funnel_brute(spark):
    out = (
        q_sql_pipe_funnel(spark, SF).toPandas().set_index("event_type")
    )
    ev = _events()
    sub = ev[ev.event_type.isin(["view", "click", "purchase"])]
    for et, grp in sub.groupby("event_type"):
        row = out.loc[et]
        assert row["n_events"] == len(grp)
        assert row["n_users"] == grp["user_id"].nunique()


def test_sql_session_var_brute(spark):
    out = (
        q_sql_session_var(spark, SF).toPandas().set_index("event_type")
    )
    ev = _events()
    thr = ev["value"].mean()
    for et, grp in ev.groupby("event_type"):
        row = out.loc[et]
        assert row["n"] == len(grp)
        assert row["n_above"] == int((grp["value"] >= thr).sum())


def test_sql_exec_immediate_brute(spark):
    out = q_sql_exec_immediate(spark, SF).toPandas().set_index("g")
    ev = _events()
    for et, grp in ev.groupby("event_type"):
        row = out.loc[et]
        assert row["n"] == len(grp)
        assert row["n_users"] == grp["user_id"].nunique()


def test_sql_groupby_all_brute(spark):
    out = (
        q_sql_groupby_all(spark, SF)
        .toPandas()
        .set_index(["event_type", "dow"])
    )
    ev = _events()
    ev["dow"] = (
        (ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
        + 3
    ) % 7
    for (et, dow), grp in ev.groupby(["event_type", "dow"]):
        row = out.loc[(et, dow)]
        assert row["n"] == len(grp)
        assert row["value_cents"] == int(
            grp["value"].mul(100).round().astype("int64").sum()
        )
