"""The engine's SQL-text surface: the same queries the DataFrame plans
answer, authored as Spark SQL over registered views, produce identical
results — a user can drive the engine through either API."""

from __future__ import annotations

from aind_smartspim_data_transformation_spark.plans.events import (
    e08_interval_join,
)
from aind_smartspim_data_transformation_spark.plans.relational import (
    q01_pricing_summary,
    q03_revenue_by_nation,
)
from aind_smartspim_data_transformation_spark.tables import register_views

Q01_SPARK_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

Q03_SPARK_SQL = """
SELECT r.r_name, n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY n.n_name, r.r_name
ORDER BY n.n_name
"""

E08_SPARK_SQL = """
SELECT c.user_id, count(*) AS n_pairs,
       round(sum(p.value), 2) AS attributed_value
FROM (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click') c
JOIN (SELECT user_id, ts AS p_ts, value FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND p.p_ts >= c.click_ts
 AND p.p_ts < c.click_ts + INTERVAL 30 MINUTES
GROUP BY c.user_id ORDER BY c.user_id
"""


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_sql_text_matches_dataframe_plans(spark, sf_dir):
    register_views(spark, sf_dir)
    assert _rows(spark.sql(Q01_SPARK_SQL)) == _rows(q01_pricing_summary(spark, sf_dir))
    assert _rows(spark.sql(Q03_SPARK_SQL)) == _rows(q03_revenue_by_nation(spark, sf_dir))
    assert _rows(spark.sql(E08_SPARK_SQL)) == _rows(e08_interval_join(spark, sf_dir))


def test_sql_text_plan_quality(spark, sf_dir):
    """SQL-authored q03 gets the same physical treatment as the
    DataFrame plan: dims broadcast, facts sort-merge — Catalyst doesn't
    care which API authored the logical plan."""
    register_views(spark, sf_dir)
    df = spark.sql(Q03_SPARK_SQL)
    df.collect()
    plan = (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert "BroadcastHashJoin" in plan
