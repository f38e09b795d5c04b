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
    * more time in listing + footer reads than in IO. Output file count =
    * ceil(input bytes / targetBytes), derived from the actual on-disk
    * size, not row counts (compression ratio varies by column content).
    * Returns the number of files written. */
  def compact(
      spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L << 20): Int = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // RECURSIVE listing: partitioned lakes nest data files under
    // partition dirs — a top-level listing would see zero parquet files,
    // compute parts=1, and silently funnel the whole dataset into one
    // file. In-flight/_temporary files are excluded from sizing the same
    // way the read excludes them.
    var totalBytes = 0L
    var nFiles = 0
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      val hidden = {
        // any ancestor dir under inPath that is hidden (_temporary, .staging)
        var q = s.getPath.getParent
        var h = name.startsWith("_") || name.startsWith(".")
        while (!h && q != null && q.toString != p.toString) {
          h = q.getName.startsWith("_") || q.getName.startsWith(".")
          q = q.getParent
        }
        h
      }
      if (s.isFile && name.endsWith(".parquet") && !hidden) {
        totalBytes += s.getLen; nFiles += 1
      }
    }
    require(nFiles > 0, s"no parquet files under $inPath — nothing to compact")
    val parts = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    // Hive-style partition dirs (col=value) must SURVIVE the rewrite —
    // a flat rewrite would inline the partition columns and lose pruning.
    // Discover them the same way Spark does: the chain of col=value dir
    // levels from the root down.
    val partCols = scala.collection.mutable.ListBuffer.empty[String]
    var level = p
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
    // repartition on the partition columns too, so each output partition
    // dir consolidates (≈ one file per value) instead of receiving
    // `parts` fragments — re-fragmenting per-directory is exactly the
    // disease this pass exists to cure
    val repart =
      if (partCols.isEmpty) df.repartition(parts)
      else df.repartition(parts,
        partCols.toSeq.map(org.apache.spark.sql.functions.col): _*)
    val w = repart.write.mode("overwrite")
    (if (partCols.isEmpty) w else w.partitionBy(partCols.toSeq: _*))
      .parquet(outPath)
    parts
  }
}
