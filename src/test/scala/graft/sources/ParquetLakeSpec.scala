package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.relational.{Observe, Skew, Tables}

class ParquetLakeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("partitioned write → partition pruning in the scan") {
    val out = Files.createTempDirectory("graft_part").toString
    val events = Tables.load(spark, dir, "events")
    ParquetLake.writePartitioned(events, out, "event_type")
    val pruned = ParquetLake.read(spark, out)
      .filter(col("event_type") === "purchase")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type"), s"no partition pruning in:\n$plan")
    assert(pruned.count() ===
      events.filter(col("event_type") === "purchase").count())
  }

  test("bucketed tables join with no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      val orders = Tables.load(spark, dir, "orders")
      val lineitem = Tables.load(spark, dir, "lineitem")
      ParquetLake.writeBucketed(orders, "b_orders", 4, "o_orderkey")
      ParquetLake.writeBucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", 4, "o_orderkey")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(joined.count() === lineitem.count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salted join equals plain join (multiset)") {
    val events = Tables.load(spark, dir, "events")
    val dim = events.select(col("user_id")).distinct()
      .withColumn("segment", pmod(col("user_id"), lit(3L)))
    val plain = events.join(dim, "user_id")
    val salted = Skew.saltedJoin(events, dim, "user_id", salts = 7)
    assert(salted.count() === plain.count())
    assert(salted.columns.sorted === plain.columns.sorted)
    assert(salted.groupBy("segment").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === plain.groupBy("segment").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("observe metrics arrive with the action (P11)") {
    val (df, obs) = Observe.logMetrics(
      graft.lsp.LspAnalytics.messageLog(spark, dir))
    val n = df.count()
    val m = obs.get
    assert(m("n_msgs") === n)
    assert(m("n_conns").asInstanceOf[Long] > 0)
    assert(m("payload_bytes").asInstanceOf[Long] > 0)
  }

  test("compaction preserves hive partition dirs and consolidates within them") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_part").toFile.getAbsolutePath
    graft.relational.Tables.load(spark, dir, "documents")
      .repartition(10) // fragment every partition dir
      .write.partitionBy("lang").parquet(s"$tmp/in")
    val inFrags = new java.io.File(s"$tmp/in").listFiles()
      .filter(_.getName.startsWith("lang=")).map(d =>
        d.listFiles().count(_.getName.endsWith(".parquet"))).sum
    assert(inFrags >= 20, s"fixture not fragmented: $inFrags")
    ParquetLake.compact(spark, s"$tmp/in", s"$tmp/out", 64L << 20)
    // partition layout SURVIVES (pruning stays possible) ...
    val outDirs = new java.io.File(s"$tmp/out").listFiles()
      .filter(_.getName.startsWith("lang=")).sortBy(_.getName)
    assert(outDirs.length === 5, s"lost partition dirs: ${outDirs.toSeq}")
    // ... consolidated (one file per dir at this size), rows intact
    outDirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) === 1,
        s"${d.getName} not consolidated")
    }
    def census(p: String) = spark.read.parquet(p)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census(s"$tmp/out") === census(s"$tmp/in"))
  }

  test("compaction FAILS LOUDLY on a partition rendering it can't reproduce") {
    import spark.implicits._
    // a lake written by another engine: zero-padded int dir (k=01) whose
    // value renders as "1" here — the per-value lookup would miss and,
    // before the guard, silently collapse the value to one file
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_compact_foreign").toFile.getAbsolutePath
    Seq((1, "a"), (1, "b")).toDF("k", "v")
      .write.parquet(s"$tmp/in/k=01")
    val ex = intercept[Exception] {
      ParquetLake.compact(spark, s"$tmp/in", s"$tmp/out", 64L << 20)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("lookup miss")),
      s"expected a loud lookup-miss failure, got: $ex")
  }

  test("compaction works on a lake rooted under a dot-directory") {
    // regression: the hidden-ancestor walk compared an UNQUALIFIED root
    // against qualified listing paths, never terminated at the root, and
    // classified every file under a dot-dir-rooted lake as hidden
    val tmp = java.nio.file.Files.createTempDirectory("graft_dot").toFile.getAbsolutePath
    val in = s"$tmp/.cache/lake"
    graft.relational.Tables.load(spark, dir, "nation").write.parquet(in)
    val written = ParquetLake.compact(spark, in, s"$tmp/out", 64L << 20)
    assert(written === 1)
    assert(spark.read.parquet(s"$tmp/out").count() ===
      spark.read.parquet(in).count())
  }

  test("partitioned compaction splits a skewed value, returns actual count") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_skew").toFile.getAbsolutePath
    // one fat value (replicated docs), several slim ones
    val docs = graft.relational.Tables.load(spark, dir, "documents")
    val skewed = docs.withColumn("shard", lit("fat"))
      .union(docs.withColumn("shard", lit("fat")))
      .union(docs.limit(20).withColumn("shard", lit("slim")))
    skewed.repartition(8).write.partitionBy("shard").parquet(s"$tmp/in")
    def files(p: String) = Option(new java.io.File(p).listFiles())
      .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
    val fatBytes = new java.io.File(s"$tmp/in/shard=fat").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val target = fatBytes / 4 + 1 // fat value needs 4 files, slim needs 1
    val written = ParquetLake.compact(spark, s"$tmp/in", s"$tmp/out", target)
    def allFiles(f: java.io.File): Int =
      if (f.isFile) (if (f.getName.endsWith(".parquet")) 1 else 0)
      else Option(f.listFiles()).getOrElse(Array.empty)
        .filterNot(c => c.getName.startsWith("_") || c.getName.startsWith("."))
        .map(allFiles).sum
    assert(written === allFiles(new java.io.File(s"$tmp/out")),
      "returned count must equal files actually written")
    assert(files(s"$tmp/out/shard=fat") >= 2,
      s"skewed value not split: ${files(s"$tmp/out/shard=fat")} file(s)")
    assert(files(s"$tmp/out/shard=slim") === 1, "slim value must consolidate")
    def census(p: String) = spark.read.parquet(p)
      .groupBy("shard").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census(s"$tmp/out") === census(s"$tmp/in"))
  }

  test("lenient read skips a corrupt file; strict read fails loudly") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_corrupt").toFile.getAbsolutePath
    graft.relational.Tables.load(spark, dir, "nation")
      .write.parquet(s"$tmp/lake")
    val rows = spark.read.parquet(s"$tmp/lake").count()
    // a truncated write: valid magic prefix, then garbage, no footer
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/lake/part-corrupt.parquet"),
      ("PAR1" + "x" * 100).getBytes)
    val lenient = ParquetLake.readLenient(spark, s"$tmp/lake")
    assert(lenient.count() === rows, "lenient read keeps every good row")
    val strict = intercept[org.apache.spark.SparkException] {
      spark.read.parquet(s"$tmp/lake").count()
    }
    assert(strict.getMessage != null)
  }

  test("compaction collapses a small-file dir to size-derived file count, rows intact") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toFile.getAbsolutePath
    val fragmented = s"$tmp/in"
    val compacted = s"$tmp/out"
    // simulate a trigger-happy ingest: 40 tiny files
    graft.relational.Tables.load(spark, dir, "events")
      .repartition(40).write.parquet(fragmented)
    def parquetFiles(p: String): Array[java.io.File] =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(fragmented).length === 40)
    val totalBytes = parquetFiles(fragmented).map(_.length).sum
    val target = totalBytes / 4 + 1 // expect ~4 output files
    val written = ParquetLake.compact(spark, fragmented, compacted, target)
    assert(parquetFiles(compacted).length === written)
    assert(written < 40 && written >= 2, s"written=$written")
    // content survives byte-for-byte (multiset of rows; decimal sum —
    // a long sum of xxhash64 values overflows under ANSI mode)
    def fingerprint(p: String) = spark.read.parquet(p)
      .agg(count(lit(1)),
        sum(xxhash64(struct(col("*"))).cast("decimal(38,0)"))).collect()(0)
    assert(fingerprint(fragmented) === fingerprint(compacted))
  }
}
