"""Registry part 5: additional analytics (q6 scan-agg, q10 top-k join,
ordered funnel)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.operators import analytics
from bb_bigdata_log_tools_spark.session import table


def _round4(df: DataFrame, cols: list[str]) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.round(F.col(c), 4))
    return df


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _round4(analytics.tpch_q6(table(spark, sf_dir, "lineitem")), ["revenue"])


SQL_TPCH_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = analytics.tpch_q10(
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "nation"),
    )
    return _round4(out, ["revenue"])


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY round(sum(l_extendedprice * (1 - l_discount)), 4) DESC, c_custkey
LIMIT 20
"""


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_funnel(table(spark, sf_dir, "events"))


SQL_EVENTS_FUNNEL = """
WITH firsts AS (
  SELECT user_id,
         min(ts) FILTER (event_type = 'signup') AS signup,
         min(ts) FILTER (event_type = 'click') AS click,
         min(ts) FILTER (event_type = 'purchase') AS purchase
  FROM events
  WHERE event_type IN ('signup', 'click', 'purchase')
  GROUP BY user_id
)
SELECT user_id,
       CAST(CASE WHEN signup IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
         AS reached_signup,
       CAST(CASE WHEN signup IS NOT NULL AND click IS NOT NULL
                      AND click > signup THEN 1 ELSE 0 END AS INTEGER)
         AS reached_click,
       CAST(CASE WHEN signup IS NOT NULL AND click IS NOT NULL
                      AND click > signup AND purchase IS NOT NULL
                      AND purchase > click THEN 1 ELSE 0 END AS INTEGER)
         AS reached_purchase
FROM firsts
ORDER BY user_id
"""


ANALYTICS2_QUERIES = {
    "tpch_q6": q_tpch_q6,
    "tpch_q10": q_tpch_q10,
    "events_funnel": q_events_funnel,
}

ANALYTICS2_ORACLES = {
    "tpch_q6": SQL_TPCH_Q6,
    "tpch_q10": SQL_TPCH_Q10,
    "events_funnel": SQL_EVENTS_FUNNEL,
}


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.tpch_q18(
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "lineitem"),
    )


SQL_TPCH_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(sum(l_quantity), 4) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING sum(l_quantity) > 250.0
  )
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 20
"""


def q_events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_moving_avg(table(spark, sf_dir, "events"))


SQL_EVENTS_MOVING_AVG = """
SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value,
       round(avg(value) OVER w, 4) AS moving_avg,
       count(*) OVER w AS n_in_window
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts_ms, event_id
"""


def q_text_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.text_ngram_counts(table(spark, sf_dir, "documents"), 2, 50)


SQL_TEXT_NGRAM_COUNTS = """
WITH words AS (SELECT string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT unnest(list_transform(generate_series(1, greatest(len(w) - 1, 1)),
                               i -> array_to_string(w[i:i+1], ' '))) AS ngram
  FROM words
)
SELECT ngram, count(*) AS n_occurrences
FROM grams WHERE ngram <> ''
GROUP BY ngram
ORDER BY n_occurrences DESC, ngram
LIMIT 50
"""

ANALYTICS2_QUERIES.update(
    {
        "tpch_q18": q_tpch_q18,
        "events_moving_avg": q_events_moving_avg,
        "text_ngram_counts": q_text_ngram_counts,
    }
)
ANALYTICS2_ORACLES.update(
    {
        "tpch_q18": SQL_TPCH_Q18,
        "events_moving_avg": SQL_EVENTS_MOVING_AVG,
        "text_ngram_counts": SQL_TEXT_NGRAM_COUNTS,
    }
)


# --------------------------------------------------------------------------
# round 3: wider TPC-H coverage (adapted to the cut-down schema — each
# docstring notes the adaptation)
# --------------------------------------------------------------------------


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.tpch_q4(
        table(spark, sf_dir, "orders"), table(spark, sf_dir, "lineitem")
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.tpch_q7(
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "supplier"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "nation"),
    )


SQL_TPCH_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS volume
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.tpch_q14(
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    )


SQL_TPCH_Q14 = """
SELECT round(
  100.0 * sum(CASE WHEN p_type = 'PROMO'
                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
"""


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.tpch_q22(
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "nation"),
    )


SQL_TPCH_Q22 = """
SELECT n_name,
       count(*) AS numcust,
       round(sum(c_acctbal), 4) AS totacctbal
FROM customer c JOIN nation ON c_nationkey = n_nationkey
WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY n_name
ORDER BY n_name
"""


ANALYTICS2_QUERIES.update(
    {
        "tpch_q4": q_tpch_q4,
        "tpch_q7": q_tpch_q7,
        "tpch_q14": q_tpch_q14,
        "tpch_q22": q_tpch_q22,
    }
)
ANALYTICS2_ORACLES.update(
    {
        "tpch_q4": SQL_TPCH_Q4,
        "tpch_q7": SQL_TPCH_Q7,
        "tpch_q14": SQL_TPCH_Q14,
        "tpch_q22": SQL_TPCH_Q22,
    }
)


def q_events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_hourly_anomaly(table(spark, sf_dir, "events"))


SQL_EVENTS_HOURLY_ANOMALY = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, hour_ts, n_events,
         avg(n_events) OVER w AS mean_n,
         stddev_samp(n_events) OVER w AS std_n,
         count(*) OVER w AS hist
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour_ts, n_events,
       round(CASE WHEN hist >= 12 AND std_n > 0
                  THEN (n_events - mean_n) / std_n END, 4) AS z_score,
       COALESCE(abs(CASE WHEN hist >= 12 AND std_n > 0
                         THEN (n_events - mean_n) / std_n END) >= 3.0,
                FALSE) AS anomalous
FROM scored
ORDER BY event_type, hour_ts
"""


ANALYTICS2_QUERIES.update({"events_hourly_anomaly": q_events_hourly_anomaly})
ANALYTICS2_ORACLES.update({"events_hourly_anomaly": SQL_EVENTS_HOURLY_ANOMALY})


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.tpch_q21(
        table(spark, sf_dir, "supplier"),
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "orders"),
    )


SQL_TPCH_Q21 = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


ANALYTICS2_QUERIES.update({"tpch_q21": q_tpch_q21})
ANALYTICS2_ORACLES.update({"tpch_q21": SQL_TPCH_Q21})


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.tpch_q12(
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "orders")
    )


SQL_TPCH_Q12 = """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
            THEN 'late' ELSE 'ontime' END AS ship_bucket,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
ORDER BY 1
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.tpch_q13(
        table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    )


SQL_TPCH_Q13 = """
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


ANALYTICS2_QUERIES.update({"tpch_q12": q_tpch_q12, "tpch_q13": q_tpch_q13})
ANALYTICS2_ORACLES.update({"tpch_q12": SQL_TPCH_Q12, "tpch_q13": SQL_TPCH_Q13})


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.tpch_q15(
        table(spark, sf_dir, "supplier"), table(spark, sf_dir, "lineitem")
    )


SQL_TPCH_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


ANALYTICS2_QUERIES.update({"tpch_q15": q_tpch_q15})
ANALYTICS2_ORACLES.update({"tpch_q15": SQL_TPCH_Q15})


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.tpch_q8(
        table(spark, sf_dir, "part"),
        table(spark, sf_dir, "supplier"),
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "nation"),
        table(spark, sf_dir, "region"),
    )


SQL_TPCH_Q8 = """
SELECT EXTRACT(year FROM o_orderdate) AS o_year,
       round(sum(CASE WHEN ns.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region ON nc.n_regionkey = r_regionkey AND r_name = 'ASIA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
ORDER BY 1
"""


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.tpch_q17(
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    )


SQL_TPCH_Q17 = """
WITH li_p AS (
  SELECT p_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#11'
), thr AS (
  SELECT p_partkey AS t_partkey, 0.2 * avg(l_quantity) AS qty_thr
  FROM li_p GROUP BY p_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
FROM li_p JOIN thr ON p_partkey = t_partkey
WHERE l_quantity < qty_thr
"""


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.tpch_q19(
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    )


SQL_TPCH_Q19 = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


ANALYTICS2_QUERIES.update(
    {"tpch_q8": q_tpch_q8, "tpch_q17": q_tpch_q17, "tpch_q19": q_tpch_q19}
)
ANALYTICS2_ORACLES.update(
    {"tpch_q8": SQL_TPCH_Q8, "tpch_q17": SQL_TPCH_Q17, "tpch_q19": SQL_TPCH_Q19}
)


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = lambda n: table(spark, sf_dir, n)  # noqa: E731
    return analytics.tpch_q9(
        t("part"), t("supplier"), t("lineitem"), t("orders"), t("nation")
    )


SQL_TPCH_Q9 = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.tpch_q16(
        table(spark, sf_dir, "part"), table(spark, sf_dir, "lineitem")
    )


SQL_TPCH_Q16 = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = lambda n: table(spark, sf_dir, n)  # noqa: E731
    return analytics.tpch_q20(
        t("part"), t("supplier"), t("lineitem"), t("nation")
    )


SQL_TPCH_Q20 = """
WITH cand AS (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%'),
qty AS (
  SELECT l_suppkey, sum(l_quantity) AS supp_qty
  FROM lineitem JOIN cand ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1
),
m AS (SELECT avg(supp_qty) AS mean_qty FROM qty)
SELECT s_name, n_name, s_acctbal, round(supp_qty, 2) AS shipped_qty
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN qty ON s_suppkey = l_suppkey
CROSS JOIN m
WHERE supp_qty > 1.0 * mean_qty
ORDER BY s_name
"""


ANALYTICS2_QUERIES.update(
    {"tpch_q9": q_tpch_q9, "tpch_q16": q_tpch_q16, "tpch_q20": q_tpch_q20}
)
ANALYTICS2_ORACLES.update(
    {"tpch_q9": SQL_TPCH_Q9, "tpch_q16": SQL_TPCH_Q16, "tpch_q20": SQL_TPCH_Q20}
)


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = lambda n: table(spark, sf_dir, n)  # noqa: E731
    return analytics.tpch_q2(
        t("part"), t("supplier"), t("lineitem"), t("nation"), t("region")
    )


SQL_TPCH_Q2 = """
WITH costs AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS supplycost
  FROM lineitem GROUP BY 1, 2
),
eligible AS (
  SELECT c.*, s_name, s_acctbal, n_name
  FROM costs c
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
),
mn AS (
  SELECT l_partkey AS m_partkey, min(supplycost) AS min_cost
  FROM eligible GROUP BY 1
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       floor(supplycost * 10000 + 0.5) / 10000 AS supplycost
FROM eligible
JOIN mn ON l_partkey = m_partkey AND supplycost = min_cost
JOIN part ON l_partkey = p_partkey
WHERE p_size BETWEEN 10 AND 20
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.tpch_q11(
        table(spark, sf_dir, "supplier"),
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "nation"),
    )


SQL_TPCH_Q11 = """
WITH val AS (
  SELECT l_partkey AS partkey,
         sum(l_extendedprice * (1 - l_discount)) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
  GROUP BY 1
),
m AS (SELECT avg(value) AS mean_value FROM val)
SELECT partkey, round(value, 4) AS value
FROM val CROSS JOIN m
WHERE value > 1.25 * mean_value
ORDER BY value DESC, partkey
"""


ANALYTICS2_QUERIES.update({"tpch_q2": q_tpch_q2, "tpch_q11": q_tpch_q11})
ANALYTICS2_ORACLES.update({"tpch_q2": SQL_TPCH_Q2, "tpch_q11": SQL_TPCH_Q11})


def q_events_robust_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_robust_anomaly(table(spark, sf_dir, "events"))


SQL_EVENTS_ROBUST_ANOMALY = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_start,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
med AS (
  SELECT event_type AS m_type, quantile_cont(n, 0.5) AS med
  FROM hourly GROUP BY 1
),
dev AS (
  SELECT h.*, m.med, abs(h.n - m.med) AS abs_dev
  FROM hourly h JOIN med m ON h.event_type = m.m_type
),
mad AS (
  SELECT event_type AS d_type, quantile_cont(abs_dev, 0.5) AS mad
  FROM dev GROUP BY 1
)
SELECT d.event_type, d.hour_start, d.n, d.med, a.mad, d.abs_dev
FROM dev d JOIN mad a ON d.event_type = a.d_type
WHERE d.abs_dev > 3.0 * a.mad
ORDER BY d.event_type, d.hour_start
"""

ANALYTICS2_QUERIES["events_robust_anomaly"] = q_events_robust_anomaly
ANALYTICS2_ORACLES["events_robust_anomaly"] = SQL_EVENTS_ROBUST_ANOMALY


def q_funnel_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.funnel_time_stats(table(spark, sf_dir, "events"))


SQL_FUNNEL_TIME_STATS = """
WITH firsts AS (
  SELECT user_id,
         min(ts) FILTER (event_type = 'signup') AS s,
         min(ts) FILTER (event_type = 'click') AS c,
         min(ts) FILTER (event_type = 'purchase') AS p
  FROM events WHERE event_type IN ('signup', 'click', 'purchase')
  GROUP BY user_id
),
conv AS (
  SELECT epoch_ms(p) - epoch_ms(s) AS dur_ms
  FROM firsts
  WHERE s IS NOT NULL AND c IS NOT NULL AND p IS NOT NULL
    AND c > s AND p > c
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       min(dur_ms) AS min_ms,
       quantile_cont(dur_ms, 0.5) AS p50_ms,
       quantile_cont(dur_ms, 0.9) AS p90_ms,
       max(dur_ms) AS max_ms
FROM conv
"""

ANALYTICS2_QUERIES["funnel_time_stats"] = q_funnel_time_stats
ANALYTICS2_ORACLES["funnel_time_stats"] = SQL_FUNNEL_TIME_STATS


def q_events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_seasonality(table(spark, sf_dir, "events"))


SQL_EVENTS_SEASONALITY = """
WITH cells AS (
  SELECT ((epoch_ms(ts) // 86400000) + 4) % 7 AS dow,
         (epoch_ms(ts) // 3600000) % 24 AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cells)
SELECT dow, hour, n, round(n * 1.0 / total, 4) AS share
FROM cells CROSS JOIN t
ORDER BY dow, hour
"""

ACF_LAGS = (1, 24, 168)


def q_events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_autocorrelation(
        table(spark, sf_dir, "events"), ACF_LAGS
    )


def _acf_oracle() -> str:
    parts = []
    for lag in ACF_LAGS:
        parts.append(f"""SELECT {lag} AS lag_hours,
       CAST(count(*) AS BIGINT) AS n_pts,
       round((avg(a.n * b.n) - avg(a.n) * avg(b.n))
             / (stddev_pop(a.n) * stddev_pop(b.n)), 4) AS acf
FROM grid a JOIN grid b ON a.h = b.h + {lag}""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH hourly AS (
  SELECT epoch_ms(ts) // 3600000 AS h, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM hourly),
grid AS (
  SELECT g.h, coalesce(hourly.n, 0) AS n
  FROM (SELECT unnest(generate_series(h0, h1)) AS h FROM bounds) g
  LEFT JOIN hourly ON g.h = hourly.h
)
{body}
ORDER BY lag_hours
"""


ANALYTICS2_QUERIES.update(
    {
        "events_seasonality": q_events_seasonality,
        "events_autocorrelation": q_events_autocorrelation,
    }
)
ANALYTICS2_ORACLES.update(
    {
        "events_seasonality": SQL_EVENTS_SEASONALITY,
        "events_autocorrelation": _acf_oracle(),
    }
)


def q_events_forecast_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_forecast_baseline(table(spark, sf_dir, "events"))


SQL_EVENTS_FORECAST_BASELINE = """
WITH hourly AS (
  SELECT event_type, epoch_ms(ts) // 3600000 AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
naive AS (
  SELECT a.event_type,
         CAST(count(*) AS BIGINT) AS n_pts_naive,
         round(avg(abs(a.n - b.n)), 4) AS mae_naive
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type AND a.h = b.h + 1
  GROUP BY 1
),
seasonal AS (
  SELECT a.event_type,
         CAST(count(*) AS BIGINT) AS n_pts_seasonal,
         round(avg(abs(a.n - b.n)), 4) AS mae_seasonal
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type AND a.h = b.h + 168
  GROUP BY 1
)
SELECT event_type, n_pts_naive, mae_naive, n_pts_seasonal, mae_seasonal
FROM naive JOIN seasonal USING (event_type)
ORDER BY event_type
"""

ANALYTICS2_QUERIES["events_forecast_baseline"] = q_events_forecast_baseline
ANALYTICS2_ORACLES["events_forecast_baseline"] = SQL_EVENTS_FORECAST_BASELINE
