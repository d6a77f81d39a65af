"""Feature-eng pack #59 (r4): the Spark 4 SQL surface as operators.

The declarative front doors a SQL-first team actually uses — SQL
scalar UDFs (``CREATE FUNCTION ... RETURN expr``, whole-stage-codegen
inlined, NOT a Python UDF), SQL table-valued UDFs, the Spark 4 pipe
syntax (``|>``), session variables (``DECLARE``/``SET VAR``) for
parameterized jobs, ``EXECUTE IMMEDIATE`` with ``IDENTIFIER()``
binding for safe dynamic SQL, and ``GROUP BY ALL``/``ORDER BY ALL``.
Each key is a REAL feature-eng query (value banding, per-type daily
actives, funnel rates, above-mean filtering, dynamic group-by) whose
DuckDB twin is plain ANSI SQL — proving the sugar desugars to the
same relational algebra.  Every definition uses CREATE OR REPLACE /
DECLARE OR REPLACE so best-of-2 bench reruns are idempotent.
"""
from __future__ import annotations

from ._shared import _t


def _ev_view(spark, sf_dir, name):
    _t(spark, sf_dir, "events").createOrReplaceTempView(name)
    return name


def q_sql_udf_scalar(spark, sf_dir):
    """Value-band features through a SQL SCALAR UDF: the banding rule
    is declared once as ``CREATE FUNCTION value_band(v) RETURN CASE``
    and reused; Catalyst inlines the body into whole-stage codegen, so
    unlike a Python UDF this is a zero-overhead abstraction (the 100 TB
    shape is identical to writing the CASE inline).  Output: events
    and exact value cents per (event_type, band)."""
    v = _ev_view(spark, sf_dir, "ev_sqlsurf1_v")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION crawlfe_value_band(v DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN v < 10 THEN 'low'
                    WHEN v < 100 THEN 'mid'
                    ELSE 'high' END
        """
    )
    return spark.sql(
        f"""
        SELECT event_type, crawlfe_value_band(value) AS band,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS value_cents
        FROM {v} GROUP BY 1, 2
        """
    )


SQL_SQL_UDF_SCALAR = """
SELECT event_type,
       CASE WHEN value < 10 THEN 'low'
            WHEN value < 100 THEN 'mid'
            ELSE 'high' END AS band,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events GROUP BY 1, 2
"""


def q_sql_udf_table(spark, sf_dir):
    """Daily-actives through a SQL TABLE-VALUED UDF: the per-type
    daily rollup is declared once as ``CREATE FUNCTION ... RETURNS
    TABLE`` and invoked in the FROM clause with a (foldable) literal
    argument — the SQL twin of a parameterized DataFrame builder
    function.  The TVF body is inlined into the caller's plan, so the
    outer aggregation still gets map-side combine over the raw scan."""
    v = _ev_view(spark, sf_dir, "ev_sqlsurf2_v")
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY FUNCTION crawlfe_type_daily(et STRING)
        RETURNS TABLE(d BIGINT, n_users BIGINT, n_events BIGINT)
        RETURN SELECT
          CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)
            AS d,
          CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
          CAST(count(*) AS BIGINT) AS n_events
        FROM {v} WHERE event_type = et GROUP BY 1
        """
    )
    return spark.sql(
        """
        SELECT d, n_users, n_events,
               round(CAST(n_events AS DOUBLE) / CAST(n_users AS DOUBLE),
                     6) AS events_per_user
        FROM crawlfe_type_daily('click')
        """
    )


SQL_SQL_UDF_TABLE = """
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01',
                        CAST(ts AS DATE)) AS BIGINT) AS d,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events WHERE event_type = 'click' GROUP BY 1
)
SELECT d, n_users, n_events,
       round(CAST(n_events AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
         AS events_per_user
FROM daily
"""


def q_sql_pipe_funnel(spark, sf_dir):
    """Per-type engagement rates in Spark 4 PIPE SYNTAX — the linear
    ``FROM |> WHERE |> AGGREGATE |> EXTEND |> WHERE`` form that reads
    in execution order (the SQL answer to method-chained DataFrames).
    Desugars to exactly the filter→agg→project plan of the ANSI twin;
    pipe syntax is parse-time sugar, so the 100 TB plan is unchanged."""
    v = _ev_view(spark, sf_dir, "ev_sqlsurf3_v")
    return spark.sql(
        f"""
        FROM {v}
        |> WHERE event_type IN ('view', 'click', 'purchase')
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_events,
                     CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
           GROUP BY event_type
        |> EXTEND round(CAST(n_events AS DOUBLE)
                        / CAST(n_users AS DOUBLE), 6) AS events_per_user
        |> WHERE n_users > 0
        """
    )


SQL_SQL_PIPE_FUNNEL = """
WITH agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
  GROUP BY 1
)
SELECT event_type, n_events, n_users,
       round(CAST(n_events AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
         AS events_per_user
FROM agg WHERE n_users > 0
"""


def q_sql_session_var(spark, sf_dir):
    """Parameterized above-global-mean filter via SESSION VARIABLES:
    ``DECLARE`` + ``SET VAR x = (scalar subquery)`` computes the
    threshold once and the main query references it by name — the SQL
    form of broadcasting a driver-computed scalar (one tiny job for
    the mean, then one scan; no recomputation per reference, no
    correlated subquery).  Per event_type: rows above the global mean
    value and their share."""
    v = _ev_view(spark, sf_dir, "ev_sqlsurf4_v")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE crawlfe_thr DOUBLE DEFAULT 0.0"
    )
    spark.sql(f"SET VAR crawlfe_thr = (SELECT avg(value) FROM {v})")
    return spark.sql(
        f"""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN value >= crawlfe_thr THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_above,
               round(CAST(sum(CASE WHEN value >= crawlfe_thr
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS share_above
        FROM {v} GROUP BY 1
        """
    )


SQL_SQL_SESSION_VAR = """
WITH thr AS (SELECT avg(value) AS t FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN value >= thr.t THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above,
       round(CAST(sum(CASE WHEN value >= thr.t THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS share_above
FROM events, thr GROUP BY event_type, thr.t
"""


def q_sql_exec_immediate(spark, sf_dir):
    """Safe DYNAMIC SQL: ``EXECUTE IMMEDIATE`` runs a template whose
    group-by column arrives as a bound parameter through
    ``IDENTIFIER(:c)`` — injection-proof identifier binding (the
    parameter is resolved as a NAME, never spliced as text) — plus a
    positional value parameter for the HAVING floor.  The template
    itself is static; only bindings vary, so plans cache by template.
    Here: group events by a caller-chosen column, keep groups with
    ≥ :m rows."""
    v = _ev_view(spark, sf_dir, "ev_sqlsurf5_v")
    return spark.sql(
        f"""
        EXECUTE IMMEDIATE
          'SELECT IDENTIFIER(:c) AS g, CAST(count(*) AS BIGINT) AS n,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
           FROM {v} GROUP BY ALL HAVING count(*) >= :m'
          USING 'event_type' AS c, 1 AS m
        """
    )


SQL_SQL_EXEC_IMMEDIATE = """
SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1 HAVING count(*) >= 1
"""


def q_sql_groupby_all(spark, sf_dir):
    """Two-dimensional rollup with ``GROUP BY ALL`` — every
    non-aggregate select item becomes a key automatically (no
    positional-list drift when columns are added) — over (event_type,
    ISO weekday).  Weekday via the engine-neutral (epoch_day+3) mod 7
    so the DuckDB twin shares one integer definition."""
    v = _ev_view(spark, sf_dir, "ev_sqlsurf6_v")
    return spark.sql(
        f"""
        SELECT event_type,
               pmod(CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')
                         AS BIGINT) + 3, 7) AS dow,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS value_cents
        FROM {v}
        GROUP BY ALL
        """
    )


SQL_SQL_GROUPBY_ALL = """
SELECT event_type,
       (CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
             AS BIGINT) + 3) % 7 AS dow,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events GROUP BY 1, 2
"""
