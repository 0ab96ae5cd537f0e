package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.TestData
import graft.TestData.r4

/** Time-series shaping: calendar gap-fill, and partition-pruned
  * read-back of a partitioned sink.
  *
  *   - `ts_gap_fill` materializes a dense daily calendar (explode of
  *     a `sequence` between the corpus min/max day — the span is a
  *     1-row broadcast) and left-joins daily revenue so missing days
  *     appear as explicit zero rows. The calendar side is O(days),
  *     never O(rows).
  *   - `sink_partition_prune` re-reads a `partitionBy(event_type)`
  *     sink with a partition-key predicate: the filter becomes
  *     directory pruning (`PartitionFilters`, pinned in PlanSpec),
  *     not a data read — the property that makes partitioned layouts
  *     pay off at 100 TB.
  */
object TimeSeries {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    "ts_gap_fill" -> ((s, d) => {
      val daily = TestData.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum("o_totalprice").as("rev"), count(lit(1)).as("n_orders"))
      val span = TestData.orders(s, d)
        .agg(min(col("o_orderdate").cast("date")).as("d0"),
             max(col("o_orderdate").cast("date")).as("d1"))
      val calendar = span
        .select(explode(sequence(col("d0"), col("d1"),
          expr("INTERVAL 1 DAY"))).as("day"))
      calendar.join(daily, Seq("day"), "left")
        .select(col("day").cast("timestamp").as("day"),
          r4(coalesce(col("rev"), lit(0.0))).as("rev"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy("day")
    }),

    // Data clustering: range-repartition + sort-within-partitions on
    // the filter column before writing, so every parquet row group
    // covers a narrow shipdate range and min/max stats skip most of
    // the file for date-range scans — the sort-order lever for
    // scan-heavy workloads at 100 TB.
    "sink_sorted_clustered" -> ((s, d) => {
      val tmp = "/root/repo/target/tmp/sink_sorted_clustered"
      graft.sources.WriteOnce.ensure(tmp, graft.sources.WriteOnce.inputTag(d, "lineitem")) {
        TestData.lineitem(s, d)
          .repartitionByRange(4, col("l_shipdate"))
          .sortWithinPartitions("l_shipdate")
          .write.mode("overwrite").parquet(tmp)
      }
      s.read.parquet(tmp)
        .filter(col("l_shipdate").between(
          lit("1997-01-01").cast("timestamp"),
          lit("1997-03-31").cast("timestamp")))
        .agg(count(lit(1)).as("n"),
             r4(sum("l_extendedprice")).as("sum_price"))
    }),

    "sink_partition_prune" -> ((s, d) => {
      val tmp = "/root/repo/target/tmp/sink_partition_prune"
      graft.sources.WriteOnce.ensure(tmp, graft.sources.WriteOnce.inputTag(d, "events")) {
        TestData.events(s, d).write.mode("overwrite")
          .partitionBy("event_type").parquet(tmp)
      }
      s.read.parquet(tmp)
        .filter(col("event_type") === "click" && col("value") > 100.0)
        .agg(count(lit(1)).as("n"), r4(sum("value")).as("sum_value"))
    }),

    // OHLC downsampling: per (user, 15-min bucket) open/high/low/
    // close/volume — the standard time-series resample. Open/close
    // are selected (not computed) values, so they pass through both
    // engines bit-identically; the (ts, event_id) sort key makes the
    // row_number pick deterministic. One window + one two-phase agg,
    // both partitioned by the same (user, bucket) key — a single
    // shuffle at any scale.
    "ts_ohlc" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "bucket_start")
      val asc = w.orderBy(col("ts").asc, col("event_id").asc)
      val desc = w.orderBy(col("ts").desc, col("event_id").desc)
      TestData.events(s, d)
        .withColumn("bucket_start",
          window(col("ts"), "15 minutes").getField("start"))
        .withColumn("rna", row_number().over(asc))
        .withColumn("rnd", row_number().over(desc))
        .groupBy("user_id", "bucket_start")
        .agg(max(when(col("rna") === 1, col("value"))).as("open"),
             max(col("value")).as("high"),
             min(col("value")).as("low"),
             max(when(col("rnd") === 1, col("value"))).as("close"),
             count(lit(1)).as("n"))
        .orderBy("user_id", "bucket_start")
    })
  )

  val oracles: Map[String, String] = Map(
    "ts_gap_fill" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day, sum(o_totalprice) AS rev,
        |         count(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |cal AS (
        |  SELECT unnest(generate_series(
        |    (SELECT min(o_orderdate::DATE) FROM orders),
        |    (SELECT max(o_orderdate::DATE) FROM orders),
        |    INTERVAL 1 DAY))::DATE AS day)
        |SELECT cal.day::TIMESTAMP AS day,
        |  floor((coalesce(rev, 0.0))*10000 + 0.5)/10000 AS rev,
        |  coalesce(n_orders, 0) AS n_orders
        |FROM cal LEFT JOIN daily ON cal.day = daily.day
        |ORDER BY day""".stripMargin,
    "sink_sorted_clustered" ->
      """SELECT count(*) AS n,
        |  floor((sum(l_extendedprice))*10000 + 0.5)/10000 AS sum_price
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-03-31'""".stripMargin,
    "sink_partition_prune" ->
      """SELECT count(*) AS n, floor((sum(value))*10000 + 0.5)/10000 AS sum_value
        |FROM events WHERE event_type = 'click' AND value > 100.0""".stripMargin,
    "ts_ohlc" ->
      """WITH b AS (
        |  SELECT user_id, time_bucket(INTERVAL '15 minutes', ts) AS bucket_start,
        |         ts, event_id, value
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id, bucket_start
        |      ORDER BY ts ASC, event_id ASC) AS rna,
        |    row_number() OVER (PARTITION BY user_id, bucket_start
        |      ORDER BY ts DESC, event_id DESC) AS rnd
        |  FROM b)
        |SELECT user_id, bucket_start,
        |  max(CASE WHEN rna = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rnd = 1 THEN value END) AS close,
        |  count(*)::BIGINT AS n
        |FROM r GROUP BY 1, 2 ORDER BY user_id, bucket_start""".stripMargin
  )
}
