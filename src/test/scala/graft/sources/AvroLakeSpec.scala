package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class AvroLakeSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro").toString

  test("round-trip: every customer row and type survives the container") {
    val cust = spark.read.parquet(sf("customer"))
    val dir = tmpDir()
    AvroFiles.write(cust, dir)
    val back = spark.read.format("graft.sources.AvroSource").load(dir)
    assert(back.schema === cust.schema)
    assert(back.exceptAll(cust).count() === 0)
    assert(cust.exceptAll(back).count() === 0)
    assert(back.count() === cust.count())
  }

  test("column pruning reaches the avro reader schema") {
    val dir = tmpDir()
    AvroFiles.write(spark.read.parquet(sf("customer")), dir)
    val pruned = spark.read.format("graft.sources.AvroSource").load(dir)
      .select("c_custkey", "c_acctbal")
    // the scan's readSchema must be the 2-column projection, not the
    // 5-column table (the SupportsPushDownRequiredColumns contract)
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scans.nonEmpty)
    scans.foreach(s =>
      assert(s.scan.readSchema().fieldNames.toSeq ===
        Seq("c_custkey", "c_acctbal")))
    // and values are right
    val want = spark.read.parquet(sf("customer"))
      .agg(sum("c_custkey"), sum(floor(col("c_acctbal") * 100 + 0.5)))
      .head
    val got = pruned
      .agg(sum("c_custkey"), sum(floor(col("c_acctbal") * 100 + 0.5)))
      .head
    assert(got === want)
  }

  test("nulls travel through union[null, T]; binary and timestamp map") {
    val dir = tmpDir()
    val df = Seq(
      (1L, Option("x"), Option(2.5), Array[Byte](1, 2, 3)),
      (2L, None: Option[String], None: Option[Double], Array[Byte]())
    ).toDF("id", "s", "d", "b")
      .withColumn("ts",
        when(col("id") === 1L,
          to_timestamp(lit("2024-03-01 12:34:56.789012"))))
      .withColumn("day", when(col("id") === 1L, to_date(lit("2024-03-01"))))
    AvroFiles.write(df, dir)
    val back = spark.read.format("graft.sources.AvroSource").load(dir)
      .orderBy("id").collect()
    assert(back(0).getString(1) === "x" && back(1).isNullAt(1))
    assert(back(0).getDouble(2) === 2.5 && back(1).isNullAt(2))
    assert(back(0).getAs[Array[Byte]](3).toSeq === Seq[Byte](1, 2, 3))
    assert(back(0).getTimestamp(4).toString === "2024-03-01 12:34:56.789012")
    assert(back(1).isNullAt(4))
    assert(back(0).getDate(5).toString === "2024-03-01")
  }

  test("multi-partition writes produce one container per partition") {
    val dir = tmpDir()
    val df = spark.range(0, 1000).toDF("id").repartition(4)
    AvroFiles.write(df, dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(parts.length === 4)
    val back = spark.read.format("graft.sources.AvroSource").load(dir)
    assert(back.rdd.getNumPartitions === 4)
    assert(back.agg(sum("id")).head.getLong(0) === 499500L)
  }

  test("sync-marker splits read every block exactly once") {
    val dir = tmpDir()
    // one fat container (single input partition on the write side):
    // ~100k rows with a payload so the file spans many 64 KB ranges
    val df = spark.range(0, 100000).toDF("id")
      .withColumn("pad", concat(lit("x"), col("id").cast("string"),
        lit("y" * 50)))
      .coalesce(1)
    AvroFiles.write(df, dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).head
    assert(file.length() > (1 << 20), "fixture must span many splits")
    val back = spark.read.format("graft.sources.AvroSource")
      .option("split_bytes", 64 * 1024).load(dir)
    // parallelism: one partition per 64 KB range of the single file
    assert(back.rdd.getNumPartitions > 10,
      s"expected many splits, got ${back.rdd.getNumPartitions}")
    // exactly-once: count and id-sum both match (a double-read block
    // breaks the sum, a dropped block breaks the count)
    assert(back.count() === 100000L)
    assert(back.agg(sum("id")).head.getLong(0) === 4999950000L)
    assert(back.select("id").distinct().count() === 100000L)
    // and the unsplit read agrees
    val whole = spark.read.format("graft.sources.AvroSource").load(dir)
    assert(whole.rdd.getNumPartitions === 1)
    assert(whole.count() === 100000L)
  }

  test("property: random rows of every mapped type round-trip exactly") {
    // generator-driven roundtrip across the full supported type matrix
    // (nullable long/int/double/float/boolean/string/binary), fixed
    // seed for reproducibility; unicode and empty strings included
    val rnd = new scala.util.Random(20260814L)
    def optional[A](v: => A): Option[A] =
      if (rnd.nextInt(5) == 0) None else Some(v)
    val alphabet = "ab é中\n\"\\x"
    def str(): String =
      (0 until rnd.nextInt(12)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    val rows = (0 until 500).map { i =>
      (i.toLong, optional(rnd.nextLong()), optional(rnd.nextInt()),
        optional(rnd.nextDouble()), optional(rnd.nextFloat()),
        optional(rnd.nextBoolean()), optional(str()),
        optional(Array.fill(rnd.nextInt(8))(rnd.nextInt().toByte)))
    }
    val df = rows.toDF("id", "l", "i", "d", "f", "b", "s", "bin")
    val dir = tmpDir()
    AvroFiles.write(df, dir)
    val back = spark.read.format("graft.sources.AvroSource").load(dir)
    assert(back.schema === df.schema)
    def canon(r: org.apache.spark.sql.Row) =
      (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6)),
        Option(r.getAs[Array[Byte]](7)).map(_.toSeq))
    assert(back.collect().map(canon).sortBy(_._1).toSeq ===
      df.collect().map(canon).sortBy(_._1).toSeq)
  }

  test("unmapped types fail loudly at schema mapping") {
    val df = Seq((1L, Seq(1, 2))).toDF("id", "arr")
    val e = intercept[IllegalArgumentException] {
      AvroLake.toAvro(df.schema, "r")
    }
    assert(e.getMessage.contains("not mapped"))
  }

  test("V2 BatchWrite: append to a fresh dir round-trips; == helper twin") {
    val cust = spark.read.parquet(sf("customer"))
    val dir = tmpDir()
    cust.write.format("graft.sources.AvroSource").mode("append").save(dir)
    val back = spark.read.format("graft.sources.AvroSource").load(dir)
    assert(back.schema === cust.schema)
    assert(back.exceptAll(cust).isEmpty && cust.exceptAll(back).isEmpty)
    // nothing staged survives a successful commit
    assert(!new java.io.File(dir).listFiles().exists(
      _.getName.endsWith(".staged")))
    // the plain helper stages the same relation
    val dir2 = tmpDir()
    AvroFiles.write(cust, dir2)
    val viaHelper = spark.read.format("graft.sources.AvroSource").load(dir2)
    assert(back.exceptAll(viaHelper).isEmpty &&
      viaHelper.exceptAll(back).isEmpty)
  }

  test("V2 BatchWrite: overwrite truncates at commit; append accumulates") {
    val dir = tmpDir()
    val a = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b = Seq((3L, "c")).toDF("id", "v")
    a.write.format("graft.sources.AvroSource").mode("append").save(dir)
    b.write.format("graft.sources.AvroSource").mode("append").save(dir)
    val appended = spark.read.format("graft.sources.AvroSource").load(dir)
    assert(appended.count() === 3)
    b.write.format("graft.sources.AvroSource").mode("overwrite").save(dir)
    val over = spark.read.format("graft.sources.AvroSource").load(dir)
      .as[(Long, String)].collect().toSet
    assert(over === Set((3L, "c")))
  }

  test("BatchWrite unit: publish-then-truncate order, zombie sweep, abort undo") {
    val dir = tmpDir()
    def mk(qid: String, name: String): java.io.File = {
      // staged containers live in the per-query staging subdirectory
      val d = new java.io.File(dir, s".staging-$qid")
      d.mkdirs()
      val f = new java.io.File(d, name)
      java.nio.file.Files.writeString(f.toPath, name)
      f
    }
    def names(): Set[String] =
      new java.io.File(dir).listFiles().map(_.getName).toSet
    val schema = new StructType().add("id", LongType)

    // COMMIT: old container truncated only after publish; a zombie
    // attempt's staged file (no commit message) is swept on success
    java.nio.file.Files.writeString(
      new java.io.File(dir, "old-1.avro").toPath, "old")
    val bw = new AvroBatchWrite(dir, schema, "q1", truncateFirst = true)
    val s1 = mk("q1", "part-00000-1-q1.avro.staged")
    val s2 = mk("q1", "part-00001-2-q1.avro.staged")
    mk("q1", "part-00001-9-q1.avro.staged") // zombie attempt
    bw.commit(Array(AvroCommit(s1.getAbsolutePath),
      AvroCommit(s2.getAbsolutePath), AvroCommit(null)))
    assert(names() === Set("part-00000-1-q1.avro", "part-00001-2-q1.avro"))

    // ABORT after a partial publish: the published finals are undone and
    // the staging dir swept — the directory returns to its pre-job state
    val bw2 = new AvroBatchWrite(dir, schema, "q2", truncateFirst = true)
    val s3 = mk("q2", "part-00000-3-q2.avro.staged")
    val s4 = mk("q2", "part-00001-4-q2.avro.staged")
    // simulate commit dying between the two renames
    assert(s3.renameTo(new java.io.File(dir, "part-00000-3-q2.avro")))
    bw2.abort(Array(AvroCommit(s3.getAbsolutePath),
      AvroCommit(s4.getAbsolutePath)))
    assert(names() === Set("part-00000-1-q1.avro", "part-00001-2-q1.avro"),
      "abort must restore exactly the pre-job directory")
  }

  test("orphan staging sweep: stale-marker dirs reclaimed, live ones kept") {
    val dir = tmpDir()
    val schema = new StructType().add("id", LongType)
    // a CRASHED query's leftover: staging dir whose heartbeat marker
    // (and contents) went stale hours ago
    val dead = new java.io.File(dir, ".staging-dead")
    dead.mkdirs()
    val deadStaged = new java.io.File(dead, "part-00000-1-dead.avro.staged")
    java.nio.file.Files.writeString(deadStaged.toPath, "x")
    val deadMarker = new java.io.File(dead, ".inprogress")
    deadMarker.createNewFile()
    val staleMs = System.currentTimeMillis() - 3 * 3600L * 1000
    deadMarker.setLastModified(staleMs)
    dead.setLastModified(staleMs)
    // a LIVE concurrent query: its AvroBatchWrite exists, so its marker
    // is heartbeat-fresh even though its staged FILE is hours old —
    // exactly the case the r13 age-based sweep would have corrupted
    val liveBw = new AvroBatchWrite(dir, schema, "qlive",
      truncateFirst = false)
    val liveStaged = new java.io.File(new java.io.File(dir, ".staging-qlive"),
      "part-00000-7-qlive.avro.staged")
    java.nio.file.Files.writeString(liveStaged.toPath, "y")
    liveStaged.setLastModified(staleMs)

    // a third query commits (empty) — its sweep must reclaim `dead`
    // and leave the live query's staging untouched
    val bw = new AvroBatchWrite(dir, schema, "q3", truncateFirst = false)
    bw.commit(Array(AvroCommit(null)))
    assert(!dead.exists(), "stale orphan staging dir must be reclaimed")
    assert(liveStaged.exists(),
      "a live writer's old staged file must survive another query's sweep")
    // the live query can still publish
    liveBw.commit(Array(AvroCommit(liveStaged.getAbsolutePath)))
    assert(new java.io.File(dir, "part-00000-7-qlive.avro").exists())
    assert(!new java.io.File(dir, ".staging-qlive").exists())
  }

  test("V2 BatchWrite: a failing task publishes nothing and leaks no staged file") {
    val dir = tmpDir()
    // seed the dir so the failed OVERWRITE can also prove it never
    // truncated (truncation happens at commit, which is never reached)
    Seq((0L, "seed")).toDF("id", "v")
      .write.format("graft.sources.AvroSource").mode("append").save(dir)
    val poison = spark.range(0, 100, 1, 4)
      .selectExpr("id",
        "CASE WHEN id = 57 THEN raise_error('boom') ELSE 'x' END AS v")
    intercept[Exception] {
      poison.write.format("graft.sources.AvroSource")
        .mode("overwrite").save(dir)
    }
    val files = new java.io.File(dir).listFiles().map(_.getName).toSeq
    assert(!files.exists(_.endsWith(".staged")),
      s"staged leak after abort: $files")
    // old data intact, no partial new containers published
    val back = spark.read.format("graft.sources.AvroSource").load(dir)
      .as[(Long, String)].collect().toSet
    assert(back === Set((0L, "seed")), s"published after failed job: $back")
  }
}
