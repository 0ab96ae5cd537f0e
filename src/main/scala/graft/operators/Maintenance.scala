package graft.operators

import graft.CkptOps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.TestData
import graft.TestData.r4

/** Table-maintenance operators: the jobs that keep a 100 TB dataset
  * servable between analytic runs (north star, BASELINE.json:6) — CDC upsert (MERGE) as a
  * copy-on-write snapshot rewrite, Z-order clustering for multi-column
  * data skipping, and incremental dedup of an arriving batch against
  * the standing corpus.
  */
object Maintenance {
  type Q = (SparkSession, String) => DataFrame

  /** Published snapshot ids under `base`, ascending: snap_<id> dirs
    * carrying both a committed write (_SUCCESS) and the published
    * marker. Staged-but-unpublished or expired snapshots never appear.
    */
  private[graft] def publishedIds(base: String): Seq[Int] =
    Option(new java.io.File(base).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("snap_")
        && new java.io.File(f, "_SUCCESS").exists()
        && new java.io.File(f, "_GRAFT_PUBLISHED").exists())
      .map(_.getName.stripPrefix("snap_").toInt).toSeq.sorted

  /** Write-audit-publish of `df` as snapshot `id` under `base`, then
    * expire published snapshots beyond the newest `retain`. The audit
    * runs against the STAGED files (what readers will see): non-empty
    * and `keyCol` complete + unique; a failing audit throws BEFORE
    * the marker lands, so readers (and [[readAsOf]]) keep serving the
    * elder snapshot. Idempotent per (input `tag`, id): a committed
    * published snapshot is never rewritten.
    */
  private[graft] def publishSnapshot(base: String, id: Int, df: DataFrame,
      tag: String, keyCol: String, retain: Int): Unit = {
    val dir = new java.io.File(base, s"snap_$id").getAbsolutePath
    graft.sources.WriteOnce.ensure(dir, tag) {
      df.write.mode("overwrite").parquet(dir)
    }
    val marker = new java.io.File(dir, "_GRAFT_PUBLISHED")
    if (!marker.exists()) {
      val staged = df.sparkSession.read.parquet(dir)
      val n = staged.count()
      val bad = staged.agg(
        sum(when(col(keyCol).isNull, 1L).otherwise(0L)),
        count(lit(1)) - countDistinct(col(keyCol))).head()
      require(n > 0 && bad.getLong(0) == 0L && bad.getLong(1) == 0L,
        s"snapshot audit failed on $dir — not publishing")
      java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
    }
    publishedIds(base).dropRight(retain).foreach { old =>
      val victim = new java.io.File(base, s"snap_$old")
      victim.listFiles().foreach(_.delete())
      victim.delete()
    }
  }

  /** Time travel: the newest published snapshot with id ≤ `asOf`.
    * Throws if every such snapshot has been expired by retention —
    * the same contract as Iceberg's snapshot-not-found.
    */
  private[graft] def readAsOf(s: SparkSession, base: String, asOf: Int): DataFrame = {
    val live = publishedIds(base).filter(_ <= asOf)
    require(live.nonEmpty,
      s"no published snapshot <= $asOf under $base (have ${publishedIds(base)})")
    s.read.parquet(new java.io.File(base, s"snap_${live.max}").getAbsolutePath)
  }

  val defs: Map[String, Q] = Map(
    // MERGE (upsert) semantics without a table format: current
    // snapshot FULL OUTER JOIN update batch → matched rows take the
    // update, unmatched updates insert, the rest carry over; the
    // merged result is rewritten as the next snapshot and read back.
    // This is copy-on-write MERGE exactly as lakehouse formats execute
    // it — at scale the join shuffles on the key (or skips unmatched
    // FILES via min/max pruning, which the Z-order key below is for)
    // and the rewrite is partition-parallel. WriteOnce skips the
    // rewrite when the committed snapshot for this input already
    // exists.
    "sink_merge_upsert" -> ((s, d) => {
      val orders = TestData.orders(s, d)
      val base = orders.filter(expr("o_orderkey % 7 <> 0"))
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val upd = orders.filter(expr("o_orderkey % 3 = 0"))
        .select(col("o_orderkey").as("u_key"),
          (col("o_totalprice") * lit(1.1)).as("u_price"))
      val merged = base
        .join(upd, col("o_orderkey") === col("u_key"), "full_outer")
        .select(
          coalesce(col("o_orderkey"), col("u_key")).as("o_orderkey"),
          coalesce(col("u_price"), col("o_totalprice")).as("price"),
          when(col("u_key").isNotNull, lit("U"))
            .otherwise(col("o_orderstatus")).as("status"))
      val tag = graft.sources.WriteOnce.inputTag(d, "orders")
      val dir = graft.sources.WriteOnce.dirFor(
        "/root/repo/target/tmp/merge_upsert", tag)
      graft.sources.WriteOnce.ensure(dir, tag) {
        merged.write.mode("overwrite").parquet(dir)
      }
      s.read.parquet(dir)
        .groupBy("status")
        .agg(count(lit(1)).as("n"), r4(sum(col("price"))).as("sum_price"))
        .orderBy("status")
    }),

    // Partition-SCOPED MERGE: the CDC upsert at 100 TB. The snapshot
    // is stored partitioned on pt; the update batch names its touched
    // partitions (a bounded distinct-collect — |partitions| values,
    // the same driver-side footprint as Delta's touched-file list);
    // the full-outer join reads ONLY those partitions (directory
    // pruning), and the rewrite is a DYNAMIC partition overwrite, so
    // untouched partitions keep their committed bytes. Contrast
    // sink_merge_upsert above, which rewrites the whole snapshot per
    // merge — at 100 TB CDC that is a full-table write per batch;
    // this key's write is O(touched), not O(table). An `_applied`
    // WriteOnce marker keeps the merge idempotent across re-runs
    // (re-merging an already-merged snapshot would compound the
    // price update).
    "sink_merge_partitioned" -> ((s, d) => {
      val orders = TestData.orders(s, d)
      val base = orders.filter(expr("o_orderkey % 7 <> 0"))
        .select(col("o_orderkey"), col("o_totalprice").as("price"),
          col("o_orderstatus").as("status"),
          expr("CAST(o_custkey % 8 AS INT)").as("pt"))
      val tag = graft.sources.WriteOnce.inputTag(d, "orders")
      val snapDir = graft.sources.WriteOnce.dirFor(
        "/root/repo/target/tmp/merge_part_snapshot", tag)
      graft.sources.WriteOnce.ensure(snapDir, tag) {
        base.write.mode("overwrite").partitionBy("pt").parquet(snapDir)
      }
      // update batch touches partitions {0, 1} only
      val upd = orders
        .filter(expr("o_orderkey % 3 = 0 AND o_custkey % 8 < 2"))
        .select(col("o_orderkey").as("u_key"),
          (col("o_totalprice") * lit(1.1)).as("u_price"),
          expr("CAST(o_custkey % 8 AS INT)").as("u_pt"))
      val appliedDir = graft.sources.WriteOnce.dirFor(
        "/root/repo/target/tmp/merge_part_applied", tag)
      graft.sources.WriteOnce.ensure(appliedDir, tag) {
        val touched = upd.select("u_pt").distinct()
          .collect().map(_.getInt(0)).sorted
        val scoped = s.read.parquet(snapDir)
          .filter(col("pt").isin(touched.map(Integer.valueOf): _*))
        val merged = scoped
          .join(upd, col("o_orderkey") === col("u_key"), "full_outer")
          .select(
            coalesce(col("o_orderkey"), col("u_key")).as("o_orderkey"),
            coalesce(col("u_price"), col("price")).as("price"),
            when(col("u_key").isNotNull, lit("U"))
              .otherwise(col("status")).as("status"),
            coalesce(col("pt"), col("u_pt")).as("pt"))
        // Materialize the merged slice BEFORE overwriting its own
        // source partitions (Spark refuses a write whose plan still
        // reads the target path). O(touched partitions) in memory —
        // the small-scale stand-in for a lakehouse staged commit
        // (write new files, then swap the manifest).
        merged.ckpt().write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("pt").parquet(snapDir)
        // commit the applied marker (ensure() then stamps _GRAFT_TAG)
        val ad = new java.io.File(appliedDir)
        ad.mkdirs()
        java.nio.file.Files.write(
          new java.io.File(ad, "_SUCCESS").toPath, Array.emptyByteArray)
      }
      s.read.parquet(snapDir)
        .groupBy("status")
        .agg(count(lit(1)).as("n"), r4(sum(col("price"))).as("sum_price"))
        .orderBy("status")
    }),

    // SMALL-FILE COMPACTION: the bin-packing rewrite every streaming
    // or CDC sink needs — micro-batch appends leave hundreds of tiny
    // files per partition, and scan cost at 100 TB is dominated by
    // file-open overhead, not bytes. Stage 1 deliberately fragments a
    // partitioned snapshot (16-way repartition before partitionBy →
    // up to 16 files per event_type dir); stage 2 compacts by
    // repartitioning ON the partition column so each type's rows
    // coalesce into one task → exactly one file per directory (at
    // real scale: repartitionByRange on (pt, size-estimate) to hit a
    // target bytes/file instead of 1). The declared output re-reads
    // the COMPACTED snapshot and checksums it per partition — the
    // oracle proves compaction moved bytes without changing ONE row —
    // and MaintenanceSpec pins the file counts (before > 1 = after).
    "sink_compact_files" -> ((s, d) => {
      val ev = TestData.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      val tag = graft.sources.WriteOnce.inputTag(d, "events")
      val smallDir = graft.sources.WriteOnce.dirFor(
        "/root/repo/target/tmp/compact_small", tag)
      graft.sources.WriteOnce.ensure(smallDir, tag) {
        ev.repartition(16, col("event_id"))
          .write.mode("overwrite").partitionBy("event_type")
          .parquet(smallDir)
      }
      val compactDir = graft.sources.WriteOnce.dirFor(
        "/root/repo/target/tmp/compact_out", tag)
      graft.sources.WriteOnce.ensure(compactDir, tag) {
        s.read.parquet(smallDir)
          .repartition(col("event_type"))
          .write.mode("overwrite").partitionBy("event_type")
          .parquet(compactDir)
      }
      s.read.parquet(compactDir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("event_id")).as("id_checksum"),
          r4(sum(col("value"))).as("sum_value"))
        .orderBy("event_type")
    }),

    // WRITE-AUDIT-PUBLISH (round 7): the governed-sink pattern every
    // production lake table needs — data lands in a STAGING location,
    // an AUDIT pass validates invariants against the staged files
    // (never the in-memory frame: the audit must see exactly what
    // readers will), and only a passing audit PUBLISHES the snapshot
    // (here: a _GRAFT_PUBLISHED marker; on a real catalog: an atomic
    // pointer swap). Readers only ever see audited data; a failing
    // audit leaves the previous published snapshot in place. The
    // declared output re-reads the PUBLISHED snapshot, so the oracle
    // proves the staged+audited+published bytes equal the source
    // transform row-for-row.
    "sink_write_audit_publish" -> ((s, d) => {
      val curated = TestData.documents(s, d)
        .filter(size(split(col("text"), " ")) >= 20)
        .select("doc_id", "lang", "source", "n_chars")
      val tag = graft.sources.WriteOnce.inputTag(d, "documents")
      val staging = graft.sources.WriteOnce.dirFor(
        "/root/repo/target/tmp/wap_staging", tag)
      graft.sources.WriteOnce.ensure(staging, tag) {
        curated.write.mode("overwrite").parquet(staging)
      }
      val marker = new java.io.File(staging, "_GRAFT_PUBLISHED")
      if (!marker.exists()) {
        val staged = s.read.parquet(staging)
        // audit invariants: non-empty, key complete + unique, domain
        val n = staged.count()
        val bad = staged.agg(
          sum(when(col("doc_id").isNull, 1L).otherwise(0L)),
          (count(lit(1)) - countDistinct(col("doc_id"))),
          sum(when(col("n_chars") <= 0, 1L).otherwise(0L))).head()
        val ok = n > 0 && (0 until 3).forall(i => bad.getLong(i) == 0L)
        require(ok, s"WAP audit failed on $staging — not publishing")
        java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
      }
      require(marker.exists(), s"unpublished snapshot at $staging")
      s.read.parquet(staging)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("id_checksum"))
        .orderBy("lang")
    }),

    // SNAPSHOT STORE + READ-AS-OF (round 8): the WAP sink above keeps
    // exactly one published marker; a real governed table keeps N
    // snapshots and serves time travel. `publishSnapshot` stages each
    // generation under snap_<id>, audits the STAGED files (non-empty,
    // unique key), publishes via marker, and expires snapshots beyond
    // the newest `retain` — the Iceberg/Delta snapshot-log contract in
    // plain parquet. The declared output reads AS-OF snapshot 1 AND
    // as-of 2 after generation 2 (deletes doc_id%10=3, updates %10=4)
    // superseded generation 1, proving the elder snapshot stays
    // readable row-for-row. MaintenanceSpec pins retention (a third
    // publish expires snap_1) and the audit-fail path.
    "sink_snapshot_read_asof" -> ((s, d) => {
      val docs = TestData.documents(s, d)
      val gen1 = docs.select(col("doc_id"), col("lang"), col("n_chars"))
      val gen2 = gen1.filter(expr("doc_id % 10 != 3"))
        .withColumn("n_chars",
          when(expr("doc_id % 10 = 4"), col("n_chars") + lit(1000))
            .otherwise(col("n_chars")))
      val tag = graft.sources.WriteOnce.inputTag(d, "documents")
      val base = graft.sources.WriteOnce.dirFor(
        "/root/repo/target/tmp/snap_store", tag)
      publishSnapshot(base, 1, gen1, tag, "doc_id", retain = 2)
      publishSnapshot(base, 2, gen2, tag, "doc_id", retain = 2)
      def summarize(df: DataFrame, id: Int) = df.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("id_checksum"))
        .withColumn("snapshot_id", lit(id))
      summarize(readAsOf(s, base, 1), 1)
        .unionByName(summarize(readAsOf(s, base, 2), 2))
        .select("snapshot_id", "lang", "n_docs", "sum_chars", "id_checksum")
        .orderBy("snapshot_id", "lang")
    }),

    // SNAPSHOT DIFF / CHANGE-DATA-FEED (round 8): given two published
    // snapshots of the governed table (gen2 = gen1 minus deletes
    // %10=3, with updates %10=4, plus inserts cloned from %10=5),
    // emit the row-grain change set (insert/update/delete with old
    // and new values) — what Delta's CDF serves and what any
    // downstream incremental consumer needs when the producer only
    // publishes full snapshots. Shape: ONE full-outer shuffle join
    // on the key between the two snapshot reads; output is
    // DELTA-sized, never corpus-sized (unchanged rows filtered
    // before the sort). At 100 TB the join prunes to files whose
    // key-range stats overlap between generations.
    "sink_snapshot_diff" -> ((s, d) => {
      val docs = TestData.documents(s, d)
      val gen1 = docs.select(col("doc_id"), col("lang"), col("n_chars"))
      val gen2 = gen1.filter(expr("doc_id % 10 != 3"))
        .withColumn("n_chars",
          when(expr("doc_id % 10 = 4"), col("n_chars") + lit(1000))
            .otherwise(col("n_chars")))
        .unionByName(gen1.filter(expr("doc_id % 10 = 5"))
          .select((col("doc_id") + lit(10000000L)).as("doc_id"),
            col("lang"), (col("n_chars") + lit(7)).as("n_chars")))
      val tag = graft.sources.WriteOnce.inputTag(d, "documents")
      val base = graft.sources.WriteOnce.dirFor(
        "/root/repo/target/tmp/snap_store_diff", tag)
      publishSnapshot(base, 1, gen1, tag, "doc_id", retain = 2)
      publishSnapshot(base, 2, gen2, tag, "doc_id", retain = 2)
      val v1 = readAsOf(s, base, 1)
        .select(col("doc_id"), col("n_chars").as("old_n_chars"))
      val v2 = readAsOf(s, base, 2)
        .select(col("doc_id"), col("n_chars").as("new_n_chars"))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .withColumn("change",
          when(col("new_n_chars").isNull, lit("delete"))
            .when(col("old_n_chars").isNull, lit("insert"))
            .when(col("old_n_chars") =!= col("new_n_chars"), lit("update")))
        .filter(col("change").isNotNull)
        .select("doc_id", "change", "old_n_chars", "new_n_chars")
        // change as a secondary sort key: if the synthetic insert-id
        // offset (doc_id + 1e7) ever collided with a real doc_id on a
        // larger fixture, the colliding rows would tie on doc_id
        // alone and row order could differ between engines (r8
        // advice item) — the full key set is always unique.
        .orderBy("doc_id", "change", "old_n_chars", "new_n_chars")
    }),

    // CONTENT-CHECKSUM MANIFEST (round 8): the cheap table-equality
    // proof a governed sink publishes next to its data — per
    // partition, row count, key checksum, and an ORDER-FREE content
    // checksum (sum of 28-bit md5 folds of the canonical row string).
    // Any engine/system can recompute the same three numbers from
    // its own copy and prove row-for-row parity without a sorted
    // compare or a shuffle join — the cross-system reconciliation
    // primitive behind migration cutovers and replica audits.
    // Because the fold-sum is commutative, the checksum is
    // partition-layout- and task-order-independent: one map-side
    // scan + a partitions-sized aggregate at any corpus size. The
    // declared query checksums the WRITTEN sink files (what a
    // downstream consumer would actually verify); the oracle
    // recomputes from the generating table.
    "sink_content_checksum" -> ((s, d) => {
      val docs = TestData.documents(s, d)
        .select("doc_id", "lang", "text")
      val tag = graft.sources.WriteOnce.inputTag(d, "documents")
      val dir = graft.sources.WriteOnce.dirFor(
        "/root/repo/target/tmp/checksum_sink", tag)
      graft.sources.WriteOnce.ensure(dir, tag) {
        docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
      }
      s.read.parquet(dir)
        .withColumn("fold",
          conv(substring(md5(concat_ws("|",
            col("doc_id").cast("string"), col("text"))), 1, 7), 16, 10)
            .cast("long"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("doc_id")).as("id_checksum"),
          sum(col("fold")).as("content_checksum"))
        .orderBy("lang")
    }),

    // Z-order clustering: interleave the bits of two predicate columns
    // into one sort key, range-partition + sort the write by it, and
    // summarize per fixed-width key range. Because the z-curve keeps
    // both dimensions local, every file (here: every 2¹⁴-wide z
    // bucket) covers a narrow min/max rectangle in BOTH columns — the
    // property that lets min/max file stats skip data for predicates
    // on either column, where a plain sort only skips on its leading
    // column. The emitted bucket stats ARE the skipping index and are
    // a pure function of the data (layout-independent), so DuckDB
    // checks them exactly.
    "sink_zorder_cluster" -> ((s, d) => {
      val o = TestData.orders(s, d).select(
        col("o_orderkey"),
        expr("o_custkey % 1024").as("x"),
        expr("datediff(to_date(o_orderdate), date'1970-01-01') % 1024").as("y"))
        .withColumn("z", expr(
          "aggregate(sequence(0, 9), 0L, (acc, i) -> " +
            "acc + shiftleft((x >> i) & 1, 2*i) + shiftleft((y >> i) & 1, 2*i + 1))"))
      val tag = graft.sources.WriteOnce.inputTag(d, "orders")
      val dir = graft.sources.WriteOnce.dirFor(
        "/root/repo/target/tmp/zorder_sink", tag)
      graft.sources.WriteOnce.ensure(dir, tag) {
        o.repartitionByRange(8, col("z")).sortWithinPartitions("z")
          .write.mode("overwrite").parquet(dir)
      }
      s.read.parquet(dir)
        .groupBy(expr("z DIV 16384").as("z_bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy("z_bucket")
    }),

    // Incremental dedup: an arriving batch (planted: every 10th doc
    // re-ingested, half verbatim, half edited) is checked against the
    // standing corpus by content hash — verbatim re-ingests resolve to
    // their existing survivor, edited ones pass as new. The corpus
    // side is the same one-hash-groupBy index `dedup_exact_hash`
    // maintains; the batch shuffle-joins on the hash (batch-sized, not
    // corpus-sized, work — at 100 TB a Bloom prefilter of corpus
    // hashes kills the non-duplicate majority map-side first, see
    // join_bloom_prefilter).
    "dedup_incremental" -> ((s, d) => {
      val docs = TestData.documents(s, d)
      val corpus = docs
        .select(TextOps.contentHash.as("h"), col("doc_id"))
        .groupBy("h").agg(min(col("doc_id")).as("dup_of"))
      val incoming = docs.filter(expr("doc_id % 10 = 7"))
        .select((col("doc_id") + lit(1000000L)).as("new_id"),
          when(expr("doc_id % 20 = 17"), concat(col("text"), lit(" zzz")))
            .otherwise(col("text")).as("text"))
      incoming.withColumn("h", TextOps.contentHash)
        .join(corpus, Seq("h"), "left")
        .select(col("new_id"),
          coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
          when(col("dup_of").isNull, lit(1)).otherwise(lit(0)).as("is_new"))
        .orderBy("new_id")
    }),

    // TABLE PROFILER: per-column null count / exact distinct / r4
    // min-max over lineitem's numeric columns, computed in ONE scan
    // (a single 20-aggregate pass reshaped to rows with stack) — the
    // stats-collection sweep behind optimizer statistics and data-
    // quality dashboards. Per-column passes would read the table k
    // times; at 100 TB this shape reads it once. (count distinct on
    // several columns in one agg expands to one Expand + aggregate —
    // still a single scan; swap in approx_count_distinct when exact
    // cardinalities aren't required.)
    "profile_columns" -> ((s, d) => {
      val cols = Seq("l_orderkey", "l_partkey", "l_quantity",
                     "l_extendedprice", "l_discount")
      val aggs = cols.flatMap { c => Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_dist"),
        r4(min(col(c)).cast("double")).as(s"${c}_min"),
        r4(max(col(c)).cast("double")).as(s"${c}_max"))
      }
      val stackArgs = cols.map(c =>
        s"'$c', ${c}_nulls, ${c}_dist, ${c}_min, ${c}_max").mkString(", ")
      TestData.lineitem(s, d)
        .agg(aggs.head, aggs.tail: _*)
        .select(expr(s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_nulls, n_distinct, min_v, max_v)"))
        .orderBy("col_name")
    }),

    // The 100 TB profiler: same one-scan stacked sweep but with
    // approx_count_distinct (HLL++), which aggregates WITHOUT the
    // Expand that multiplies shuffle rows ~6× under multi-column exact
    // countDistinct — cardinalities become fixed-size sketches merged
    // map-side. Oracle-omitted (HLL estimates are sketch-impl-specific
    // so DuckDB's numbers differ by design); PropertySpec bounds every
    // estimate within ±5 % of the exact profiler's count and PlanSpec
    // pins the Expand-free single scan.
    "profile_columns_approx" -> ((s, d) => {
      val cols = Seq("l_orderkey", "l_partkey", "l_quantity",
                     "l_extendedprice", "l_discount")
      // rsd 0.02: the sketch grows to a few KB per column (still
      // fixed-size, still map-side-merged) and the estimate lands
      // within the ±5 % property bound with margin
      val aggs = cols.flatMap { c => Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}_nulls"),
        approx_count_distinct(col(c), 0.02).as(s"${c}_dist"),
        r4(min(col(c)).cast("double")).as(s"${c}_min"),
        r4(max(col(c)).cast("double")).as(s"${c}_max"))
      }
      val stackArgs = cols.map(c =>
        s"'$c', ${c}_nulls, ${c}_dist, ${c}_min, ${c}_max").mkString(", ")
      TestData.lineitem(s, d)
        .agg(aggs.head, aggs.tail: _*)
        .select(expr(s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_nulls, n_distinct, min_v, max_v)"))
        .orderBy("col_name")
    }),

    // DATA-QUALITY ASSERTIONS (round 11): the dbt-style constraint
    // gate the profiler family observes but never ENFORCES — one row
    // per declared constraint with its violation count and pass/fail
    // verdict (uniqueness, accepted-value domain, null-rate ceiling,
    // positivity, referential integrity). Real pipelines run this
    // far more often than drift scans: it is the publish gate.
    // Scale shape: ONE aggregate pass per table (the profile_columns
    // one-scan discipline — both events checks ride one aggregate,
    // both orders checks another, stacked to rows); the RI check is
    // the only join and probes the DISTINCT parent-key table. The
    // fixture exercises both verdicts: 'error' events violate the
    // accepted-value domain, everything else passes.
    "profile_assert_constraints" -> ((s, d) => {
      val ev = TestData.events(s, d).agg(
        count(lit(1)).as("n"),
        sum(when(col("event_type").isin(
          "click", "purchase", "signup", "view"), 0L).otherwise(1L))
          .as("bad_domain"),
        (count(lit(1)) - count(col("value"))).as("n_null_value"))
        .select(expr("stack(2, " +
          "'accepted_values_event_type', n, bad_domain, bad_domain = 0, " +
          "'null_rate_value_le_1pct', n, n_null_value, " +
          "n_null_value * 100 <= n) " +
          "AS (constraint_name, n_checked, n_violations, passed)"))
        .withColumn("table_name", lit("events"))
      val od = TestData.orders(s, d).agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_keys"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("nonpos"))
        .select(expr("stack(2, " +
          "'unique_o_orderkey', n, dup_keys, dup_keys = 0, " +
          "'positive_o_totalprice', n, nonpos, nonpos = 0) " +
          "AS (constraint_name, n_checked, n_violations, passed)"))
        .withColumn("table_name", lit("orders"))
      val ri = TestData.orders(s, d)
        .join(TestData.customer(s, d).select(col("c_custkey")).distinct()
            .withColumn("hit", lit(1)),
          col("o_custkey") === col("c_custkey"), "left")
        .agg(count(lit(1)).as("n"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("orphans"))
        .select(lit("referential_orders_customer").as("constraint_name"),
          col("n").as("n_checked"), col("orphans").as("n_violations"),
          (col("orphans") === 0).as("passed"))
        .withColumn("table_name", lit("orders"))
      ev.unionByName(od).unionByName(ri)
        .select("constraint_name", "table_name", "n_checked",
          "n_violations", "passed")
        .orderBy("constraint_name")
    }),

    // DRIFT MONITORING via Population Stability Index (round 7): the
    // standard serving/training distribution-shift check — fixed
    // equal-width bins over the monitored metric, reference vs
    // current populations split at a cutover date, per-bin PSI term
    // (p_ref − p_cur)·ln(p_ref/p_cur) quantized to integer MICRO-
    // UNITS before any summing (the repo's quantize-before-sum rule
    // for transcendental terms: identical op order both engines, the
    // downstream total is an order-free BIGINT sum). FIXED bins (not
    // quantiles) keep the pass one map-side scan + a 10-row
    // aggregate at any corpus size; bins empty on either side emit
    // NULL terms (standard PSI epsilon-handling is a policy choice —
    // surfacing the empty bin beats silently smoothing it).
    "profile_drift_psi" -> ((s, d) => {
      val cut = lit("1998-07-01").cast("timestamp")
      val totals = TestData.orders(s, d)
        .withColumn("bin",
          least(lit(9), floor(col("o_totalprice") / 50000)).cast("int"))
        .groupBy("bin")
        .agg(sum(when(col("o_orderdate") < cut, 1L).otherwise(0L)).as("n_ref"),
             sum(when(col("o_orderdate") >= cut, 1L).otherwise(0L)).as("n_cur"))
      val W = org.apache.spark.sql.expressions.Window
      totals
        .withColumn("t_ref", sum("n_ref").over(W.partitionBy()))
        .withColumn("t_cur", sum("n_cur").over(W.partitionBy()))
        .withColumn("psi_term_u",
          when(col("n_ref") > 0 && col("n_cur") > 0,
            floor(((col("n_ref") / col("t_ref"))
                 - (col("n_cur") / col("t_cur")))
              * log((col("n_ref") / col("t_ref"))
                  / (col("n_cur") / col("t_cur")))
              * 1000000 + 0.5).cast("long")))
        .select("bin", "n_ref", "n_cur", "psi_term_u")
        .orderBy("bin")
    }),

    // The profiler's QUANTILE sweep (round 8): per-column approx
    // quantiles (Greenwald–Khanna sketch, accuracy 1000 ⇒ rank error
    // ε = 1/1000) composed into the same ONE-SCAN stacked profile as
    // profile_columns_approx — nulls/distincts/min/max told you the
    // column's envelope, the quantiles tell you its shape. GK
    // summaries are bounded-size and mergeable (partial per partition,
    // merged at the driver-side of the agg), so the pass stays a
    // single map-side-combined scan at 100 TB — the exact-percentile
    // sibling (agg_percentile_exact) needs a per-group sort instead.
    // Oracle-omitted: the driver's hash compare needs exact equality,
    // and a GK estimate only coincides with DuckDB's exact quantile
    // when the target rank sits more than ε·n ranks away from a
    // value-change boundary — a data-distribution property that is
    // not stable under driver fixture regeneration. The sketch's
    // actual published contract IS the rank bound, and PropertySpec
    // pins exactly that: for every (column, p), the estimate is a
    // data element whose rank is within ε·n of ⌈p·n⌉.
    "profile_columns_quantiles" -> ((s, d) => {
      val cols = Seq("l_orderkey", "l_partkey", "l_quantity",
                     "l_extendedprice", "l_discount")
      val ps = Seq(0.25, 0.5, 0.75, 0.9)
      val aggs = cols.flatMap { c => Seq(
        count(col(c)).as(s"${c}_n"),
        approx_percentile(col(c).cast("double"),
          array(ps.map(lit): _*), lit(1000)).as(s"${c}_q"))
      }
      val stackArgs = cols.map(c =>
        s"'$c', ${c}_n, ${c}_q[0], ${c}_q[1], ${c}_q[2], ${c}_q[3]")
        .mkString(", ")
      TestData.lineitem(s, d)
        .agg(aggs.head, aggs.tail: _*)
        .select(expr(s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_rows, p25, p50, p75, p90)"))
        .orderBy("col_name")
    }),

    // SHARD-MERGEABLE QUANTILE PROFILE (round 13): the 100 TB
    // profile story profile_columns_quantiles (GK, oracle-omitted)
    // could not give an EXACT contract for — per-shard equi-depth
    // histograms (32 bounds each, integer ranks via rangedRank so no
    // shard ever funnels through one task) merged to global
    // approximate quantiles by a weighted cumulative over the
    // 32·|shards|-row bound table. Everything is closed-form integer
    // arithmetic (bound ranks r_i = ⌈i·n_s/32⌉ via DIV, weights
    // r_i − r_{i−1}, quantile pick by cum·100 ≥ p·n cross-multiply),
    // so unlike GK the result is EXACTLY reproducible and oracle-
    // checkable — and the per-shard histograms are the mergeable
    // artifact a fleet of profilers ships to a coordinator (the
    // agg_sketch_merge analog for quantiles). Rank-ε property: each
    // returned value's exact rank is within Σ_s ⌈n_s/32⌉ of p·n/100
    // (PropertySpec). Shards here are l_orderkey mod 8 (any
    // partition key works; at 100 TB they are the parquet shards).
    "profile_quantile_merge" -> ((s, d) =>
      mergedQuantiles(TestData.lineitem(s, d)
        .select((col("l_orderkey") % 8).as("shard"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("v"),
          col("l_orderkey").as("tb1"), col("l_linenumber").as("tb2")))),

    // QUANTILE-SHIFT DRIFT (round 9, r8 verdict item 6): distribution
    // drift WITHOUT fixed bins — profile_drift_psi needs a binning
    // that was chosen when the reference was profiled, and a shift
    // entirely inside one bin is invisible to it; the quantile sweep
    // sees any shift ≥ the rank resolution. One conditional GK scan
    // ([[quantileDrift]]): per column, the ref-half and cur-half
    // sketches accumulate in the SAME map-side-combined aggregate
    // (CASE-gated inputs), then each (column, p) row reads
    // q_ref/q_cur and their r4 shift. Same scale shape as the
    // profiler: one pass, bounded sketch state, at any corpus size.
    // Oracle-omitted for the same reason as profile_columns_quantiles
    // (GK estimates cannot be equality-oracled); PropertySpec pins
    // the rank-ε contract on BOTH halves.
    "profile_drift_quantile" -> ((s, d) =>
      quantileDrift(TestData.lineitem(s, d),
        col("l_shipdate") >= lit("1995-06-01"),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        Seq(0.25, 0.5, 0.75, 0.9), 1000))
  )

  /** Shard-merged approximate quantiles (see `profile_quantile_merge`):
    * input (shard, v BIGINT, tb1, tb2) with (v, tb1, tb2) a total
    * order within shard. Per shard: global integer rank via
    * `Curation.rangedRank` (bounded task size at any shard skew),
    * equi-depth bounds at ranks ⌈i·n_s/`buckets`⌉ with exact integer
    * weights r_i − r_{i−1}; merge: weighted cumulative over the
    * buckets·|shards|-row bound table (a domain-bounded unpartitioned
    * window), quantile p picked by the integer cross-multiply
    * cum·100 ≥ p·n_total. No division anywhere ⇒ nothing to guard
    * and the result is bit-identical across engines. Output one row
    * per requested percentile: (p, value_cents = min qualifying
    * bound, n_total). Shared by the declared key and
    * `GraftEngine.mergedQuantiles`.
    */
  private[graft] def mergedQuantiles(values: DataFrame, buckets: Int = 32,
      pcts: Seq[Int] = Seq(25, 50, 75, 90, 99)): DataFrame = {
    require(buckets >= 1 && pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "buckets >= 1, pcts in [1, 100]")
    val s = values.sparkSession
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val ranked = graft.operators.Curation.rangedRank(values, "shard",
        Seq(col("v"), col("tb1"), col("tb2")), "rk")
      .ckpt() // two consumers: shard sizes + bound pick
    val targets = ranked.groupBy("shard").agg(max("rk").as("n_s"))
      .crossJoin(broadcast((1 to buckets).toDF("i")))
      .withColumn("r_i", expr(s"(i * n_s + ${buckets - 1}) DIV $buckets"))
      .withColumnRenamed("shard", "t_shard")
    val bounds = ranked
      .join(broadcast(targets),
        col("shard") === col("t_shard") && col("rk") === col("r_i"))
      .select(col("shard"), col("i"), col("r_i"), col("v"))
    // SCALE NOTE: the weighted-cumulative merge below rides one
    // unpartitioned window over the bound table, i.e. ONE task sees
    // buckets·|shards| rows (8 shards × 32 buckets = 256 here). Each
    // row is 4 small columns, so this stays trivially fine up to
    // ~10^5 shards (≈ 3M tiny rows); past that, re-plan onto the
    // house shardedPrefixSum (or a two-level merge: merge groups of
    // ~1k shards, then merge the group summaries) before believing
    // the single-task stage at fleet scale.
    val wI = W.partitionBy("shard").orderBy("i")
    val merged = bounds
      .withColumn("w",
        col("r_i") - coalesce(lag("r_i", 1).over(wI), lit(0L)))
      .withColumn("cum", sum("w").over(W.orderBy("v", "shard", "i")
        .rowsBetween(W.unboundedPreceding, W.currentRow)))
      .withColumn("n_total", sum("w").over(W.partitionBy()))
    merged.crossJoin(broadcast(pcts.toDF("p")))
      .filter(col("cum") * 100 >= col("p") * col("n_total"))
      .groupBy("p")
      .agg(min("v").as("value_cents"), max("n_total").as("n_total"))
      .orderBy("p")
  }

  /** Conditional one-scan quantile-drift sweep: for every column in
    * `cols` and percentile in `ps`, GK estimates over the rows where
    * `curFlag` is false (reference) and true (current), side by side
    * with the r4'd shift. Shared by the declared key and the facade's
    * `quantileDrift` (parity-pinned in EngineApiSpec).
    */
  private[graft] def quantileDrift(df: DataFrame, curFlag: Column,
      cols: Seq[String], ps: Seq[Double], accuracy: Int): DataFrame = {
    require(cols.nonEmpty && ps.nonEmpty, "need columns and percentiles")
    val aggs = cols.flatMap { c => Seq(
      count(when(!curFlag, col(c))).as(s"${c}_nr"),
      count(when(curFlag, col(c))).as(s"${c}_nc"),
      approx_percentile(when(!curFlag, col(c).cast("double")),
        array(ps.map(lit): _*), lit(accuracy)).as(s"${c}_qr"),
      approx_percentile(when(curFlag, col(c).cast("double")),
        array(ps.map(lit): _*), lit(accuracy)).as(s"${c}_qc"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, " +
        cols.map(c => s"'$c', ${c}_nr, ${c}_nc, ${c}_qr, ${c}_qc")
          .mkString(", ") +
        ") AS (col_name, n_ref, n_cur, qr, qc)"))
      .select(col("col_name"), col("n_ref"), col("n_cur"),
        posexplode(arrays_zip(col("qr"), col("qc"))))
      .select(col("col_name"),
        element_at(lit(ps.toArray), col("pos") + 1).as("p"),
        col("n_ref"), col("n_cur"),
        col("col.qr").as("q_ref"), col("col.qc").as("q_cur"),
        TestData.r4(col("col.qc") - col("col.qr")).as("shift"))
      .orderBy("col_name", "p")
  }

  val oracles: Map[String, String] = Map(
    // Each constraint re-derived independently: one aggregate per
    // table, the RI check via LEFT JOIN against DISTINCT parent keys.
    "profile_assert_constraints" ->
      """WITH ev AS (
        |  SELECT count(*)::BIGINT AS n,
        |    sum(CASE WHEN event_type IN
        |      ('click', 'purchase', 'signup', 'view')
        |      THEN 0 ELSE 1 END)::BIGINT AS bad_domain,
        |    (count(*) - count(value))::BIGINT AS n_null_value
        |  FROM events),
        |od AS (
        |  SELECT count(*)::BIGINT AS n,
        |    (count(*) - count(DISTINCT o_orderkey))::BIGINT AS dup_keys,
        |    sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS nonpos
        |  FROM orders),
        |ri AS (
        |  SELECT count(*)::BIGINT AS n,
        |    sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
        |      AS orphans
        |  FROM orders o
        |  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o.o_custkey = c.c_custkey)
        |SELECT * FROM (
        |  SELECT 'accepted_values_event_type' AS constraint_name,
        |    'events' AS table_name, n AS n_checked,
        |    bad_domain AS n_violations, bad_domain = 0 AS passed FROM ev
        |  UNION ALL
        |  SELECT 'null_rate_value_le_1pct', 'events', n, n_null_value,
        |    n_null_value * 100 <= n FROM ev
        |  UNION ALL
        |  SELECT 'unique_o_orderkey', 'orders', n, dup_keys,
        |    dup_keys = 0 FROM od
        |  UNION ALL
        |  SELECT 'positive_o_totalprice', 'orders', n, nonpos,
        |    nonpos = 0 FROM od
        |  UNION ALL
        |  SELECT 'referential_orders_customer', 'orders', n, orphans,
        |    orphans = 0 FROM ri)
        |ORDER BY constraint_name""".stripMargin,
    // Identical op order to the Spark side: p = n::DOUBLE / total,
    // term = (p_ref − p_cur)·ln(p_ref/p_cur), floor(·1e6 + 0.5).
    // sum(..) OVER () is HUGEINT in DuckDB → ::BIGINT (CLAUDE.md trap).
    "profile_drift_psi" ->
      """WITH b AS (
        |  SELECT least(9, floor(o_totalprice / 50000))::INT AS bin,
        |    sum(CASE WHEN o_orderdate < TIMESTAMP '1998-07-01'
        |        THEN 1 ELSE 0 END)::BIGINT AS n_ref,
        |    sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-07-01'
        |        THEN 1 ELSE 0 END)::BIGINT AS n_cur
        |  FROM orders GROUP BY 1),
        |t AS (
        |  SELECT bin, n_ref, n_cur,
        |    (sum(n_ref) OVER ())::BIGINT AS t_ref,
        |    (sum(n_cur) OVER ())::BIGINT AS t_cur
        |  FROM b)
        |SELECT bin, n_ref, n_cur,
        |  CASE WHEN n_ref > 0 AND n_cur > 0 THEN
        |    floor(((n_ref::DOUBLE / t_ref) - (n_cur::DOUBLE / t_cur))
        |      * ln((n_ref::DOUBLE / t_ref) / (n_cur::DOUBLE / t_cur))
        |      * 1000000 + 0.5)::BIGINT
        |  END AS psi_term_u
        |FROM t ORDER BY bin""".stripMargin,
    // Monolithic per-shard rank (bit-identical to rangedRank by
    // construction), same integer bound/weight/cross-multiply algebra.
    "profile_quantile_merge" ->
      """WITH v AS (
        |  SELECT l_orderkey % 8 AS shard,
        |    floor(l_extendedprice * 100 + 0.5)::BIGINT AS v,
        |    l_orderkey AS tb1, l_linenumber AS tb2
        |  FROM lineitem),
        |r AS (
        |  SELECT shard, v, row_number() OVER (
        |    PARTITION BY shard ORDER BY v, tb1, tb2)::BIGINT AS rk
        |  FROM v),
        |ns AS (SELECT shard, count(*)::BIGINT AS n_s FROM v GROUP BY 1),
        |tgt AS (
        |  SELECT ns.shard, i.i, ((i.i * ns.n_s + 31) // 32)::BIGINT AS r_i
        |  FROM ns CROSS JOIN (SELECT unnest(range(1, 33)) AS i) i),
        |b AS (
        |  SELECT t.shard, t.i, t.r_i, r.v
        |  FROM tgt t JOIN r ON r.shard = t.shard AND r.rk = t.r_i),
        |w AS (
        |  SELECT shard, i, v,
        |    (r_i - coalesce(lag(r_i) OVER (
        |      PARTITION BY shard ORDER BY i), 0))::BIGINT AS w
        |  FROM b),
        |m AS (
        |  SELECT v, shard, i, w,
        |    (sum(w) OVER (ORDER BY v, shard, i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
        |      AS cum,
        |    (sum(w) OVER ())::BIGINT AS n_total
        |  FROM w)
        |SELECT p.p, min(m.v) AS value_cents, max(m.n_total) AS n_total
        |FROM m CROSS JOIN (SELECT unnest([25, 50, 75, 90, 99]) AS p) p
        |WHERE m.cum * 100 >= p.p * m.n_total
        |GROUP BY p.p ORDER BY p.p""".stripMargin,
    // The published snapshot must equal the source transform exactly.
    "sink_write_audit_publish" ->
      """SELECT lang, count(*)::BIGINT AS n_docs,
        |  sum(n_chars)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS id_checksum
        |FROM documents
        |WHERE len(string_split(text, ' ')) >= 20
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // Each snapshot's as-of read must equal its generation's source
    // transform exactly — the oracle derives BOTH generations straight
    // off the fixture (gen2 = deletes %10=3, updates %10=4).
    "sink_snapshot_read_asof" ->
      """WITH g2 AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 10 = 4 THEN n_chars + 1000
        |         ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 10 <> 3)
        |SELECT * FROM (
        |  SELECT 1 AS snapshot_id, lang, count(*)::BIGINT AS n_docs,
        |    sum(n_chars)::BIGINT AS sum_chars,
        |    sum(doc_id)::BIGINT AS id_checksum
        |  FROM documents GROUP BY lang
        |  UNION ALL
        |  SELECT 2, lang, count(*)::BIGINT, sum(n_chars)::BIGINT,
        |    sum(doc_id)::BIGINT
        |  FROM g2 GROUP BY lang)
        |ORDER BY snapshot_id, lang""".stripMargin,
    // The change set derived straight off the fixture: both
    // generations rebuilt from `documents`, full-outer joined.
    "sink_snapshot_diff" ->
      """WITH g1 AS (SELECT doc_id, n_chars FROM documents),
        |g2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 4 THEN n_chars + 1000
        |         ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 10 <> 3
        |  UNION ALL
        |  SELECT doc_id + 10000000, n_chars + 7
        |  FROM documents WHERE doc_id % 10 = 5)
        |SELECT coalesce(g1.doc_id, g2.doc_id) AS doc_id,
        |  CASE WHEN g2.doc_id IS NULL THEN 'delete'
        |       WHEN g1.doc_id IS NULL THEN 'insert'
        |       WHEN g1.n_chars <> g2.n_chars THEN 'update' END AS change,
        |  g1.n_chars AS old_n_chars, g2.n_chars AS new_n_chars
        |FROM g1 FULL OUTER JOIN g2 ON g1.doc_id = g2.doc_id
        |WHERE g2.doc_id IS NULL OR g1.doc_id IS NULL
        |   OR g1.n_chars <> g2.n_chars
        |ORDER BY doc_id, change, old_n_chars NULLS FIRST,
        |  new_n_chars NULLS FIRST""".stripMargin,
    // The oracle recomputes the manifest from the generating table —
    // proving the written files carry exactly the source rows.
    "sink_content_checksum" ->
      """SELECT lang, count(*)::BIGINT AS n_rows,
        |  sum(doc_id)::BIGINT AS id_checksum,
        |  sum(('0x' || substring(md5(doc_id::VARCHAR || '|' || text),
        |       1, 7))::BIGINT)::BIGINT AS content_checksum
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // Content parity straight off the fixture: if compaction changed
    // (or dropped, or duplicated) a single row, n / id_checksum /
    // sum_value diverge.
    "sink_compact_files" ->
      """SELECT event_type, count(*)::BIGINT AS n,
        |  sum(event_id)::BIGINT AS id_checksum,
        |  floor((sum(value))*10000 + 0.5)/10000 AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "profile_columns" ->
      """SELECT * FROM (
        |  SELECT 'l_orderkey' AS col_name,
        |    (count(*) - count(l_orderkey))::BIGINT AS n_nulls,
        |    count(DISTINCT l_orderkey)::BIGINT AS n_distinct,
        |    floor((min(l_orderkey)::DOUBLE)*10000 + 0.5)/10000 AS min_v,
        |    floor((max(l_orderkey)::DOUBLE)*10000 + 0.5)/10000 AS max_v
        |  FROM lineitem
        |  UNION ALL SELECT 'l_partkey',
        |    (count(*) - count(l_partkey))::BIGINT,
        |    count(DISTINCT l_partkey)::BIGINT,
        |    floor((min(l_partkey)::DOUBLE)*10000 + 0.5)/10000,
        |    floor((max(l_partkey)::DOUBLE)*10000 + 0.5)/10000 FROM lineitem
        |  UNION ALL SELECT 'l_quantity',
        |    (count(*) - count(l_quantity))::BIGINT,
        |    count(DISTINCT l_quantity)::BIGINT,
        |    floor((min(l_quantity))*10000 + 0.5)/10000,
        |    floor((max(l_quantity))*10000 + 0.5)/10000 FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice',
        |    (count(*) - count(l_extendedprice))::BIGINT,
        |    count(DISTINCT l_extendedprice)::BIGINT,
        |    floor((min(l_extendedprice))*10000 + 0.5)/10000,
        |    floor((max(l_extendedprice))*10000 + 0.5)/10000 FROM lineitem
        |  UNION ALL SELECT 'l_discount',
        |    (count(*) - count(l_discount))::BIGINT,
        |    count(DISTINCT l_discount)::BIGINT,
        |    floor((min(l_discount))*10000 + 0.5)/10000,
        |    floor((max(l_discount))*10000 + 0.5)/10000 FROM lineitem)
        |ORDER BY col_name""".stripMargin,
    "sink_merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |  WHERE o_orderkey % 7 <> 0),
        |upd AS (
        |  SELECT o_orderkey AS u_key, o_totalprice * 1.1 AS u_price FROM orders
        |  WHERE o_orderkey % 3 = 0),
        |m AS (
        |  SELECT coalesce(u_price, o_totalprice) AS price,
        |    CASE WHEN u_key IS NOT NULL THEN 'U' ELSE o_orderstatus END AS status
        |  FROM base FULL OUTER JOIN upd ON o_orderkey = u_key)
        |SELECT status, count(*)::BIGINT AS n,
        |  floor((sum(price))*10000 + 0.5)/10000 AS sum_price
        |FROM m GROUP BY status ORDER BY status""".stripMargin,
    // Scoped merge ≡ (merged touched partitions) ∪ (untouched base
    // rows verbatim) — the oracle computes both legs relationally.
    "sink_merge_partitioned" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice AS price, o_orderstatus AS status,
        |    (o_custkey % 8)::INT AS pt
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |upd AS (
        |  SELECT o_orderkey AS u_key, o_totalprice * 1.1 AS u_price,
        |    (o_custkey % 8)::INT AS u_pt
        |  FROM orders WHERE o_orderkey % 3 = 0 AND o_custkey % 8 < 2),
        |touched AS (SELECT DISTINCT u_pt FROM upd),
        |m AS (
        |  SELECT coalesce(u_price, price) AS price,
        |    CASE WHEN u_key IS NOT NULL THEN 'U' ELSE status END AS status
        |  FROM (SELECT * FROM base WHERE pt IN (SELECT u_pt FROM touched)) b
        |  FULL OUTER JOIN upd ON b.o_orderkey = u_key
        |  UNION ALL
        |  SELECT price, status FROM base
        |  WHERE pt NOT IN (SELECT u_pt FROM touched))
        |SELECT status, count(*)::BIGINT AS n,
        |  floor((sum(price))*10000 + 0.5)/10000 AS sum_price
        |FROM m GROUP BY status ORDER BY status""".stripMargin,
    "sink_zorder_cluster" ->
      """WITH o AS (
        |  SELECT o_custkey % 1024 AS x,
        |    datediff('day', DATE '1970-01-01', o_orderdate::DATE) % 1024 AS y
        |  FROM orders),
        |z AS (
        |  SELECT x, y,
        |    list_sum([(((x >> i) & 1) << (2*i)) + (((y >> i) & 1) << (2*i + 1))
        |              for i in range(0, 10)])::BIGINT AS z
        |  FROM o)
        |SELECT z // 16384 AS z_bucket, count(*)::BIGINT AS n,
        |  min(x) AS min_x, max(x) AS max_x,
        |  min(y) AS min_y, max(y) AS max_y
        |FROM z GROUP BY 1 ORDER BY z_bucket""".stripMargin,
    "dedup_incremental" ->
      """WITH corpus AS (
        |  SELECT md5(lower(trim(text))) AS h, min(doc_id) AS dup_of
        |  FROM documents GROUP BY 1),
        |inc AS (
        |  SELECT doc_id + 1000000 AS new_id,
        |    CASE WHEN doc_id % 20 = 17 THEN text || ' zzz' ELSE text END AS text
        |  FROM documents WHERE doc_id % 10 = 7)
        |SELECT i.new_id, coalesce(c.dup_of, -1) AS dup_of,
        |  CASE WHEN c.dup_of IS NULL THEN 1 ELSE 0 END AS is_new
        |FROM inc i LEFT JOIN corpus c ON md5(lower(trim(i.text))) = c.h
        |ORDER BY new_id""".stripMargin
  )
}
