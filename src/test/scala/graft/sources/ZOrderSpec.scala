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

  test("hilbert xy2d/d2xy round-trip; consecutive indices are adjacent") {
    val rnd = new scala.util.Random(11)
    (0 until 2000).foreach { _ =>
      val x = rnd.nextInt(1 << 16).toLong
      val y = rnd.nextInt(1 << 16).toLong
      val d = HilbertKernels.xy2d(x, y)
      assert(d >= 0 && d < (1L << 32))
      assert(HilbertKernels.d2xy(d) === ((x, y)), s"round-trip ($x,$y)")
    }
    // THE Hilbert property (Z-order lacks it): consecutive curve
    // positions are always Manhattan-adjacent cells — no seams
    (0 until 2000).foreach { _ =>
      val d = (rnd.nextLong() & ((1L << 32) - 1)) - 1 match {
        case n if n < 0 => 0L
        case n => n
      }
      val (x1, y1) = HilbertKernels.d2xy(d)
      val (x2, y2) = HilbertKernels.d2xy(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"d=$d: ($x1,$y1) -> ($x2,$y2) not adjacent")
    }
    // Z-order's seam, for contrast: positions 1 and 2 are NOT adjacent
    // under Morton on the diagonal jump (compact(2)=0, compact(2>>1)=1
    // vs compact(1)=1, compact(1>>1)=0 — distance 2)
    assert(ZOrderKernels.compact(1L) + ZOrderKernels.compact(2L) === 1L)
  }

  test("hilbert_index expression matches the kernel and registers in SQL") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (100L, 200L),
      (65535L, 65535L), (4095L, 17L))
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.functions.hilbert_index(col("a"), col("b")).as("h"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, h) =>
      assert(h === HilbertKernels.xy2d(a, b), s"($a,$b)")
    }
    val viaSql = spark.sql(
      "SELECT hilbert_index(100, 200)").collect().head.getLong(0)
    assert(viaSql === HilbertKernels.xy2d(100L, 200L))
  }

  test("hilbert-sorted row-count chunks bound tighter boxes than z-sorted") {
    // parquet row groups cut by ROW COUNT, not by index alignment — the
    // regime where the two curves differ (power-of-4-aligned buckets
    // cover identical 32x32 blocks under both curves, only relabeled)
    val rows = graft.relational.Tables
      .load(spark, "/root/testdata/sf0.01", "events")
      .select(col("user_id").bitwiseAND(lit(65535L)),
        greatest(floor(col("value")).cast("long"), lit(0L))
          .bitwiseAND(lit(65535L)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def meanPerimeter(key: (Long, Long) => Long, chunk: Int): Double = {
      val sorted = rows.sortBy { case (u, v) => (key(u, v), u, v) }
      val chunks = sorted.grouped(chunk).toSeq
      chunks.map { c =>
        val us = c.map(_._1); val vs = c.map(_._2)
        (us.max - us.min + 1) + (vs.max - vs.min + 1).toDouble
      }.sum / chunks.size
    }
    val z = meanPerimeter(ZOrderKernels.interleave, 100)
    val h = meanPerimeter(HilbertKernels.xy2d, 100)
    assert(h < z, s"hilbert $h !< zorder $z")
  }
}
