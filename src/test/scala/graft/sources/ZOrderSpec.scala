package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  test("interleave/compact round-trip and order locality") {
    val rnd = new scala.util.Random(7)
    (0 until 2000).foreach { _ =>
      val a = rnd.nextInt(1 << 16).toLong
      val b = rnd.nextInt(1 << 16).toLong
      val z = ZOrderKernels.interleave(a, b)
      assert(ZOrderKernels.compact(z) === a)
      assert(ZOrderKernels.compact(z >> 1) === b)
    }
    // locality: nearby (a,b) cells share high z bits (the property that
    // bounds both dimensions within a z range)
    assert((ZOrderKernels.interleave(5, 9) ^ ZOrderKernels.interleave(4, 8)) < 16)
  }

  test("z-sorted layout skips row groups on a 2-D predicate; 1-D sort cannot") {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile

    // sf0.01: user_id spans 0..149, floor(value) 0..490 — big enough for
    // 16 range partitions with meaningful per-group stats
    val df = graft.relational.Tables.load(spark, "/root/testdata/sf0.01", "events")
      .select(col("user_id"), floor(col("value")).cast("long").as("qv"))
      .withColumn("z", graft.functions.z_order(col("user_id"), col("qv")))

    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toFile
    val zdir = new java.io.File(base, "by_z").getAbsolutePath
    val udir = new java.io.File(base, "by_user").getAbsolutePath
    try {
    df.repartitionByRange(16, col("z")).sortWithinPartitions("z")
      .write.parquet(zdir)
    df.repartitionByRange(16, col("user_id")).sortWithinPartitions("user_id")
      .write.parquet(udir)

    def rowGroups(path: String): Seq[Map[String, (Long, Long)]] = {
      val conf = spark.sparkContext.hadoopConfiguration
      new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq
        .flatMap { f =>
          val reader = ParquetFileReader.open(
            HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
          try {
            import scala.jdk.CollectionConverters._
            reader.getFooter.getBlocks.asScala.toSeq.map { block =>
              block.getColumns.asScala.map { c =>
                val st = c.getStatistics
                c.getPath.toDotString -> (
                  st.genericGetMin.asInstanceOf[Long].longValue(),
                  st.genericGetMax.asInstanceOf[Long].longValue())
              }.toMap
            }
          } finally reader.close()
        }
    }
    def mustScan(
        groups: Seq[Map[String, (Long, Long)]],
        col: String, lo: Long, hi: Long): Int =
      groups.count { g =>
        val (mn, mx) = g(col)
        mx >= lo && mn <= hi
      }

    val zGroups = rowGroups(zdir)
    val uGroups = rowGroups(udir)
    assert(zGroups.size >= 8 && uGroups.size >= 8, "need real row groups")

    // the balanced-pruning property: a single-key sort prunes ONLY its
    // own dimension (every group spans the full range of the other); the
    // z-sort bounds BOTH dimensions per group, so min/max stats prune
    // range predicates on EITHER dimension
    val uBox = (40L, 70L)   // selective on user_id
    val vBox = (60L, 140L)  // selective on qv
    val zOnU = mustScan(zGroups, "user_id", uBox._1, uBox._2)
    val zOnV = mustScan(zGroups, "qv", vBox._1, vBox._2)
    val uOnU = mustScan(uGroups, "user_id", uBox._1, uBox._2)
    val uOnV = mustScan(uGroups, "qv", vBox._1, vBox._2)
    info(s"scan fraction u-predicate: z=$zOnU/${zGroups.size} u-sort=$uOnU/${uGroups.size}")
    info(s"scan fraction v-predicate: z=$zOnV/${zGroups.size} u-sort=$uOnV/${uGroups.size}")
    // the u-sort is blind on the v predicate: all groups span it
    assert(uOnV === uGroups.size,
      s"single-key sort should be unable to prune the other dimension: $uOnV")
    // the z-sort prunes BOTH dimensions (neither scan is a full scan)
    assert(zOnU < zGroups.size, s"z-order failed to prune user predicate: $zOnU")
    assert(zOnV < zGroups.size, s"z-order failed to prune value predicate: $zOnV")
    assert(zOnV < uOnV, "z-order must beat the blind dimension")
    // the tradeoff is explicit: the leading key of a 1-D sort prunes its
    // own dimension harder than z does (that's the deal z-order makes)
    assert(uOnU <= zOnU)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(base)
    }
  }
}
