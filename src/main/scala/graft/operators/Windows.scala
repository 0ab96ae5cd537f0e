package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.TestData
import graft.TestData.r4

/** §2.E window functions (SURVEY.md).
  *
  * Every window here is partitioned (user_id / nationkey) except the
  * two global-cumulative demos — partitioned windows are the shape
  * that scales (one shuffle on the partition key, per-partition
  * sort); a global window funnels all rows into one task and is only
  * acceptable on pre-aggregated (small) inputs, which is what
  * `win_range_frame` / `win_cumulative` operate on here.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    "win_ranking" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      TestData.customer(s, d)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"))
        .filter(col("rn") <= 5)
        .orderBy("c_nationkey", "rn")
    }),

    "win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      TestData.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"),
          lag("value", 1).over(w).as("prev_value"),
          lead("value", 1).over(w).as("next_value"),
          (col("value") - lag("value", 1).over(w)).as("delta"))
        .orderBy("user_id", "ts", "event_id")
    }),

    "win_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-3, 0)
      TestData.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          r4(avg("value").over(w)).as("ma4"))
        .orderBy("user_id", "ts", "event_id")
    }),

    // 7-day trailing revenue: pre-aggregate to day grain (small), then
    // RANGE frame over the integer day ordinal.
    "win_range_frame" -> ((s, d) => {
      val daily = TestData.orders(s, d)
        .groupBy(datediff(col("o_orderdate"),
                          lit("1995-01-01").cast("timestamp")).as("day_ord"))
        .agg(sum("o_totalprice").as("day_rev"))
      val w = Window.orderBy("day_ord").rangeBetween(-6, 0)
      daily.select(col("day_ord"), r4(col("day_rev")).as("day_rev"),
                   r4(sum("day_rev").over(w)).as("rev_7d"))
        .orderBy("day_ord")
    }),

    // TIME-interval RANGE frame at event grain: each event's trailing
    // 1-hour activity per user (rate-limit / rolling-exposure shape) —
    // the range rides integer epoch-micros so the frame boundary is
    // exact, and the summed measure is pre-quantized to integer cents
    // (RANGE peers and float association order then can't flip a
    // bit cross-engine). One shuffle on user_id.
    "win_range_interval" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(-3600000000L, 0L)
      TestData.events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
        .select(col("user_id"), col("event_id"), col("ts"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("cents")).over(w).as("cents_1h"))
        .orderBy("user_id", "ts", "event_id")
    }),

    // GLOBAL cumulative analytics WITHOUT the single-task window
    // (r12 re-plan; the r11 verdict's scale grade): the total order
    // (o_orderdate, o_orderkey) is reconstructed hierarchically —
    // Curation.rangedRank gives the global row rank (range-exchange
    // + per-slice local rank + broadcast offsets), then
    // shardedPrefixSum over that rank gives the exact running sum.
    // Every corpus-grain window partitions on (g, slice); only the
    // slice-count-sized offset windows order a whole partition
    // (PlanSpec pins this shape). The summed measure is integer
    // CENTS before any sum (repo determinism rule — sharded partial
    // sums reassociate, so only exact integers reconstruct the
    // sequential total bit-for-bit), and percent_rank / cume_dist /
    // ntile(4) are closed forms over (rank, N): with a unique total
    // order, pct = (r-1)/(N-1), cdist = r/N, and ntile's first N%4
    // buckets carry N DIV 4 + 1 rows — all integer arithmetic on
    // non-negative quantities (DIV == // there).
    "win_cumulative" -> ((s, d) => {
      val base = TestData.orders(s, d)
        .filter(col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderdate"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .withColumn("g", lit(0))
      val ranked = graft.operators.Curation.rangedRank(base, "g",
        Seq(col("o_orderdate"), col("o_orderkey")), "rnk")
      val run = graft.operators.Curation.shardedPrefixSum(
        ranked, "g", "rnk", "cents", "rc0")
      val n = base.groupBy("g").agg(count(lit(1)).as("n_tot"))
      val b1 = expr("n_tot DIV 4 + 1") // size of the first N%4 buckets
      run.join(broadcast(n), "g")
        .withColumn("rc", col("rc0") + col("cents"))
        .select(col("o_orderkey"), col("o_orderdate"),
          r4(col("rc").cast("double") / 100.0).as("running_total"),
          when(col("n_tot") > 1,
            r4((col("rnk") - 1).cast("double") / (col("n_tot") - 1)))
            .otherwise(lit(0.0)).as("pct_rank"),
          r4(col("rnk").cast("double") / col("n_tot")).as("cdist"),
          when(col("rnk") <= (col("n_tot") % 4) * b1,
            expr("(rnk - 1) DIV (n_tot DIV 4 + 1) + 1"))
            .otherwise((col("n_tot") % 4) + expr(
              "(rnk - (n_tot % 4) * (n_tot DIV 4 + 1) - 1) DIV greatest(n_tot DIV 4, 1) + 1"))
            .cast("int").as("quartile"))
        .orderBy("o_orderkey")
    }),

    "win_first_last" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      TestData.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          first("c_name").over(w).as("richest"),
          last("c_name").over(w).as("poorest"))
        .orderBy("c_custkey")
    }),

    // Distribution functions: ntile buckets + percent_rank/cume_dist
    // (r4-quantized — they are ratios of ranks, identical in both
    // engines given the same total order).
    "win_distribution" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      TestData.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          ntile(4).over(w).as("quartile"),
          r4(percent_rank().over(w)).as("pct_rank"),
          r4(cume_dist().over(w)).as("cum_dist"))
        .orderBy("c_custkey")
    }),

    // nth_value with an unbounded frame: positional pick from a
    // sorted partition (here: each nation's 2nd/3rd richest
    // customer), NULL where the partition is too small.
    "win_nth_value" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      TestData.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          nth_value(col("c_name"), 2).over(w).as("second_richest"),
          nth_value(col("c_name"), 3).over(w).as("third_richest"))
        .orderBy("c_custkey")
    }),

    // Rolling exact median over a bounded row frame — the robust
    // (outlier-insensitive) smoother next to win_moving_avg's mean.
    // Spark's `percentile(…, 0.5)` and DuckDB's `quantile_cont(…, 0.5)`
    // share the same linear-interpolation contract (pinned by
    // agg_percentile_exact), and a ≤4-row frame makes the interpolation
    // a single (a+b)/2 on identical inputs — bit-stable cross-engine.
    "win_rolling_median" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, 0)
      TestData.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          r4(percentile(col("value"), lit(0.5)).over(w)).as("rolling_median"))
        .orderBy("user_id", "ts", "event_id")
    }),

    // Rolling DISTINCT count — neither engine supports
    // count(DISTINCT) over a frame directly; the portable form
    // collects the frame into a list and distinct-counts it (frame is
    // 5 rows, so the per-row list is bounded — this never buffers
    // unbounded state). The behavioral-variety signal over a sliding
    // event window.
    "win_distinct_rolling" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, 0)
      TestData.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          size(array_distinct(collect_list(col("event_type")).over(w)))
            .as("n_distinct_5"))
        .orderBy("user_id", "ts", "event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "win_ranking" ->
      """SELECT * FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey))
        |WHERE rn <= 5 ORDER BY c_nationkey, rn""".stripMargin,
    "win_lag_lead" ->
      """SELECT user_id, event_id, ts, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  value - lag(value, 1) OVER w AS delta
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "win_moving_avg" ->
      """SELECT user_id, event_id, ts,
        |  floor((avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))*10000 + 0.5)/10000 AS ma4
        |FROM events ORDER BY user_id, ts, event_id""".stripMargin,
    "win_range_frame" ->
      """WITH daily AS (
        |  SELECT date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS day_ord,
        |         sum(o_totalprice) AS day_rev
        |  FROM orders GROUP BY 1)
        |SELECT day_ord, floor((day_rev)*10000 + 0.5)/10000 AS day_rev,
        |  floor((sum(day_rev) OVER (ORDER BY day_ord
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))*10000 + 0.5)/10000 AS rev_7d
        |FROM daily ORDER BY day_ord""".stripMargin,
    "win_range_interval" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
        |    floor(value*100 + 0.5)::BIGINT AS cents
        |  FROM events)
        |SELECT user_id, event_id, ts,
        |  (count(*) OVER w)::BIGINT AS n_1h,
        |  (sum(cents) OVER w)::BIGINT AS cents_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id""".stripMargin,
    // cents-exact running sum (the sharded reconstruction only
    // matches a sequential sum on exact integers); rank functions via
    // the same closed forms the Spark side computes from (rank, N) —
    // DuckDB's native ntile/percent_rank agree, the closed form just
    // keeps both engines on ONE definition.
    "win_cumulative" ->
      """WITH f AS (
        |  SELECT o_orderkey, o_orderdate,
        |    floor(o_totalprice*100 + 0.5)::BIGINT AS cents
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1995-04-01'),
        |r AS (
        |  SELECT o_orderkey, o_orderdate,
        |    row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rnk,
        |    (sum(cents) OVER (ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS rc,
        |    count(*) OVER () AS n FROM f)
        |SELECT o_orderkey, o_orderdate,
        |  floor((rc::DOUBLE / 100.0)*10000 + 0.5)/10000 AS running_total,
        |  CASE WHEN n > 1
        |    THEN floor(((rnk - 1)::DOUBLE / (n - 1))*10000 + 0.5)/10000
        |    ELSE 0.0 END AS pct_rank,
        |  floor((rnk::DOUBLE / n)*10000 + 0.5)/10000 AS cdist,
        |  (CASE WHEN rnk <= (n % 4) * (n // 4 + 1)
        |    THEN (rnk - 1) // (n // 4 + 1) + 1
        |    ELSE (n % 4) + (rnk - (n % 4) * (n // 4 + 1) - 1)
        |      // greatest(n // 4, 1) + 1 END)::INT AS quartile
        |FROM r ORDER BY o_orderkey""".stripMargin,
    "win_first_last" ->
      """SELECT c_custkey, c_nationkey,
        |  first_value(c_name) OVER w AS richest,
        |  last_value(c_name) OVER w AS poorest
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_custkey""".stripMargin,
    "win_distribution" ->
      """SELECT c_custkey, c_nationkey,
        |  ntile(4) OVER w AS quartile,
        |  floor((percent_rank() OVER w)*10000 + 0.5)/10000 AS pct_rank,
        |  floor((cume_dist() OVER w)*10000 + 0.5)/10000 AS cum_dist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "win_nth_value" ->
      """SELECT c_custkey, c_nationkey,
        |  nth_value(c_name, 2) OVER w AS second_richest,
        |  nth_value(c_name, 3) OVER w AS third_richest
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_custkey""".stripMargin,
    "win_rolling_median" ->
      """SELECT user_id, event_id, ts,
        |  floor((quantile_cont(value, 0.5) OVER w)*10000 + 0.5)/10000 AS rolling_median
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "win_distinct_rolling" ->
      """SELECT user_id, event_id, ts,
        |  len(list_distinct(list(event_type) OVER w))::INT AS n_distinct_5
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id""".stripMargin
  )
}
