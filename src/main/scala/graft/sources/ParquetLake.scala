package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}

/** Parquet lake layout helpers — the physical-design levers that matter at
  * 100 TB (the reference has zero persistence; this is the generalization
  * its keyspace partitioning points at):
  *
  *   - **Hive-style partitioning** → partition PRUNING: a filter on the
  *     partition column skips whole directories before any IO.
  *   - **Bucketing** → co-located joins: two tables bucketed on the same
  *     key join with NO shuffle exchange (verified in the test suite by
  *     asserting the absence of `Exchange` nodes).
  */
object ParquetLake {

  /** Write partitioned by low-cardinality columns (directory per value). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Write as a bucketed managed table (bucket-pruned, shuffle-free joins
    * for same-bucketing tables). Spark only supports bucketing via
    * `saveAsTable`. */
  def writeBucketed(
      df: DataFrame, table: String, buckets: Int, bucketCol: String,
      sortCol: Option[String] = None): Unit = {
    val w: DataFrameWriter[Row] = df.write.mode("overwrite")
      .format("parquet").bucketBy(buckets, bucketCol)
    sortCol.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Read tolerating corrupt/truncated files (skipped, not fatal) — the
    * drop-don't-crash posture of the reference's datagram path
    * (`lsp_server.c:218-224`), applied to the lake: at 100 TB some file
    * is always mid-write, truncated by a died task, or bit-rotted, and
    * one bad footer must not kill a million-file scan. Scoped to the
    * READ (per-source option), not the session-wide
    * `spark.sql.files.ignoreCorruptFiles`, so strict reads elsewhere
    * still fail loudly. */
  def readLenient(spark: SparkSession, path: String): DataFrame =
    spark.read.option("ignoreCorruptFiles", "true").parquet(path)

  /** Compact a directory of small parquet files into ≈`targetBytes`
    * outputs (the OPTIMIZE/maintenance pass every real lake runs):
    * ingest and streaming sinks produce file counts proportional to
    * task × trigger counts, and at 100 TB the resulting footer/open
    * overhead dominates scan setup — a scan of 10⁶ × 1 MB files spends
    * more time in listing + footer reads than in IO. Output file counts
    * are derived from the actual on-disk size, not row counts
    * (compression ratio varies by column content); for a hive-partitioned
    * lake each partition VALUE gets ceil(its bytes / targetBytes) files,
    * so a skewed value splits instead of collapsing into one giant file.
    * Returns the number of files actually written. */
  def compact(
      spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L << 20): Int = {
    import org.apache.spark.sql.functions._
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the listing returns fully-QUALIFIED paths (scheme + authority);
    // the ancestor walk below must compare against the equally-qualified
    // root or it never terminates at the root and inspects ancestors
    // ABOVE inPath — a lake rooted anywhere under a dot-dir would then
    // classify every file as hidden
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(inPath))
    // RECURSIVE listing: partitioned lakes nest data files under
    // partition dirs — a top-level listing would see zero parquet files,
    // compute parts=1, and silently funnel the whole dataset into one
    // file. In-flight/_temporary files are excluded from sizing the same
    // way the read excludes them. Bytes are tallied per partition-dir
    // chain so the partitioned branch can size per VALUE.
    var totalBytes = 0L
    var nFiles = 0
    val bytesByDir = scala.collection.mutable.Map.empty[Seq[String], Long]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      // ancestor dirs under root, outermost first; hidden if any level
      // (or the file itself) is a _temporary/.staging-style name
      val segs = scala.collection.mutable.ListBuffer.empty[String]
      var hidden = name.startsWith("_") || name.startsWith(".")
      var q = s.getPath.getParent
      while (q != null && q != root) {
        hidden = hidden || q.getName.startsWith("_") || q.getName.startsWith(".")
        q.getName +=: segs
        q = q.getParent
      }
      if (s.isFile && name.endsWith(".parquet") && !hidden) {
        totalBytes += s.getLen; nFiles += 1
        val key = segs.toSeq
        bytesByDir(key) = bytesByDir.getOrElse(key, 0L) + s.getLen
      }
    }
    require(nFiles > 0, s"no parquet files under $inPath — nothing to compact")
    def filesFor(bytes: Long): Int =
      math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    // Hive-style partition dirs (col=value) must SURVIVE the rewrite —
    // a flat rewrite would inline the partition columns and lose pruning.
    // Discover them the same way Spark does: the chain of col=value dir
    // levels from the root down.
    val partCols = scala.collection.mutable.ListBuffer.empty[String]
    var level = root
    var descend = true
    while (descend) {
      val dirs = fs.listStatus(level).filter(s => s.isDirectory &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      dirs.headOption.map(_.getPath.getName.split("=", 2)) match {
        case Some(Array(col, _)) if dirs.forall(_.getPath.getName.startsWith(col + "=")) =>
          partCols += col; level = dirs.head.getPath
        case _ => descend = false
      }
    }
    val df = spark.read.parquet(inPath)
    val repart =
      if (partCols.isEmpty) df.repartition(filesFor(totalBytes))
      else {
        // Per-VALUE file counts from the per-dir byte tally: each value
        // gets a salt domain of ceil(value bytes / targetBytes), so small
        // values consolidate to one file while a skewed value splits to
        // ≈targetBytes outputs instead of one giant file. The salt is a
        // DETERMINISTIC hash of the data columns (retry-safe, unlike
        // rand()); routing hashes (partCols, salt) across 4× the total
        // bucket count so distinct salts of one value land in distinct
        // tasks w.h.p. (same-task salts merely merge back into one file).
        val k = partCols.length
        // two distinct on-disk dirs (non-canonical %XX escapes) that
        // unescape to the SAME value would silently merge here with
        // last-wins byte counts — refuse instead of mis-sizing
        val byValue = bytesByDir.groupMapReduce(_._1.take(k))(_._2)(_ + _)
          .toSeq
          .groupBy { case (dirs, _) =>
            dirs.map(seg => unescapePathName(seg.split("=", 2)(1))).toList
          }
        byValue.foreach { case (vs, entries) =>
          require(entries.size == 1,
            s"partition dirs ${entries.map(_._1.mkString("/")).mkString(" and ")} " +
              s"all unescape to ${vs.mkString("/")} — non-canonical lake layout, " +
              "refusing to compact (rows would collapse into one mis-sized value)")
        }
        val filesByValue =
          byValue.map { case (vs, entries) => vs -> filesFor(entries.head._2) }
        val totalFiles = filesByValue.values.sum
        val lookupCols = partCols.toSeq.map(c => s"__pv_$c")
        val lookup = spark.createDataFrame(
          spark.sparkContext.parallelize(
            filesByValue.toSeq.map { case (vs, nf) => Row.fromSeq(vs :+ nf) }, 1),
          org.apache.spark.sql.types.StructType(
            lookupCols.map(org.apache.spark.sql.types.StructField(_,
              org.apache.spark.sql.types.StringType)) :+
              org.apache.spark.sql.types.StructField("__nf",
                org.apache.spark.sql.types.IntegerType)))
        // join key: the partition value rendered as the path does (null →
        // __HIVE_DEFAULT_PARTITION__, others via cast-to-string — the
        // same rendering Spark's partition-path writer uses for the
        // primitive partition types supported here)
        val dataCols = df.columns.filterNot(partCols.contains).map(col).toSeq
        val joinCond = partCols.toSeq.map(c =>
          coalesce(col(c).cast("string"),
            lit("__HIVE_DEFAULT_PARTITION__")) === col(s"__pv_$c"))
          .reduce(_ && _)
        // every row MUST hit the lookup: a miss means the path-derived
        // value table and the data disagree (a lake written with a
        // rendering this walker doesn't reproduce — zero-padded ints,
        // exotic date/decimal forms). Silently falling back to one file
        // per missed value hid exactly that; fail in-plan instead.
        df.join(broadcast(lookup), joinCond, "left")
          .withColumn("__nf",
            when(col("__nf").isNotNull, col("__nf"))
              .otherwise(raise_error(concat(
                lit("compaction partition-value lookup miss for ("),
                concat_ws(",", partCols.toSeq.map(c =>
                  coalesce(col(c).cast("string"), lit("NULL"))): _*),
                lit(") — lake partition rendering not reproduced by the dir walk")))))
          .withColumn("__salt",
            pmod(xxhash64(dataCols: _*), col("__nf").cast("long")))
          .repartition(math.max(1, 4 * totalFiles),
            partCols.toSeq.map(col) :+ col("__salt"): _*)
          .drop("__salt" +: "__nf" +: lookupCols: _*)
      }
    val w = repart.write.mode("overwrite")
    (if (partCols.isEmpty) w else w.partitionBy(partCols.toSeq: _*))
      .parquet(outPath)
    // report what actually landed, not the plan — per-task dynamic
    // writers can merge same-value salt buckets that hash together
    val outRoot = fs.makeQualified(new org.apache.hadoop.fs.Path(outPath))
    val outIt = fs.listFiles(outRoot, true)
    var written = 0
    while (outIt.hasNext) {
      val s = outIt.next()
      if (s.isFile && s.getPath.getName.endsWith(".parquet") &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
        written += 1
    }
    written
  }

  /** Inverse of Hive's partition-path escaping (%XX for specials) —
    * `lang=pt%2Dbr` reads back as value `pt-br`. */
  private def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
        s.substring(i + 1, i + 3).forall(ch => Character.digit(ch, 16) >= 0)) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
