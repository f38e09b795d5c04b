package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Fixed-point hard-sigmoid logistic regression: learns a separable
  * vocabulary split perfectly, is deterministic, and its registered
  * query keeps the (doc_id, label, score_fp, keep) contract. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Separable fixture: positives draw from one vocabulary, negatives
    * from a disjoint one — a linear model over hashed token counts must
    * split this exactly. */
  private def fixture = {
    val good = Seq("clean", "prose", "article", "reference", "cited")
    val bad = Seq("spam", "casino", "click", "winner", "pills")
    (0L until 40L).map { i =>
      val words = if (i % 2 == 0) good else bad
      val text = (0 until 12).map(j => words((i + j).toInt % 5)).mkString(" ")
      (i, text, if (i % 2 == 0) 1L else 0L)
    }.toDF("doc_id", "text", "y")
  }

  test("separable corpus is classified perfectly after training") {
    val out = QualityClassifier.classify(spark, fixture).collect()
    assert(out.length === 40)
    out.foreach { r =>
      val (label, keep) = (r.getLong(1), r.getBoolean(3))
      assert(keep === (label === 1L),
        s"doc ${r.getLong(0)} label $label misclassified (keep=$keep)")
    }
    // scores actually separate (not a degenerate all-zero model)
    val scores = out.map(r => (r.getLong(1), r.getLong(2)))
    assert(scores.filter(_._1 === 1L).map(_._2).min >
      scores.filter(_._1 === 0L).map(_._2).max)
  }

  test("training is deterministic: two runs produce identical scores") {
    val a = QualityClassifier.classify(spark, fixture)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val b = QualityClassifier.classify(spark, fixture)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(a === b)
  }

  test("q_quality_classifier scores every document, keep tracks sign") {
    val res = QualityClassifier
      .qQualityClassifier(spark, "/root/testdata/sf0.001").cache()
    val nDocs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(res.count() === nDocs)
    assert(res.filter((col("score_fp") >= 0) =!= col("keep")).count() === 0)
    // labels present on both sides of the reference split
    assert(res.filter(col("label") === 1L).count() > 0)
    assert(res.filter(col("label") === 0L).count() > 0)
    res.unpersist()
  }

  test("calibration bins tie out against a JVM replay of the scored frame") {
    val dir = "/root/testdata/sf0.001"
    val scored = QualityClassifier.qQualityClassifier(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2))) // (label, z)
    val S = QualityClassifier.S
    def sdiv4(z: Long): Long = if (z >= 0) z / 4 else -((-z) / 4)
    val want = scored
      .map { case (y, z) =>
        val p = math.max(0L, math.min(S, S / 2 + sdiv4(z)))
        (math.min(9L, p / 100000), y, p)
      }
      .groupBy(_._1)
      .map { case (bin, rows) =>
        val n = rows.length.toLong
        val sp = rows.map(_._3).sum
        val sy = rows.map(_._2).sum
        bin -> (n, sp / n, 1000000L * sy / n,
          math.abs(sp / n - 1000000L * sy / n))
      }
    val got = QualityClassifier.qCalibration(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === want)
    // bins partition the scored set
    assert(got.values.map(_._1).sum === scored.length.toLong)
  }

  test("AUC equals the all-pairs comparison count and beats chance") {
    val dir = "/root/testdata/sf0.001"
    val scored = QualityClassifier.qQualityClassifier(spark, dir)
      .selectExpr("label", "score_fp").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pos = scored.filter(_._1 == 1L).map(_._2)
    val neg = scored.filter(_._1 == 0L).map(_._2)
    // 2U = 2·#{(p,n): p > n} + #{ties} over all cross pairs
    val u2 = pos.map(p =>
      2L * neg.count(_ < p) + neg.count(_ == p)).sum
    val Array(row) = QualityClassifier.qAuc(spark, dir).collect()
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      === ((pos.length.toLong, neg.length.toLong, u2,
        u2 * 500000L / (pos.length.toLong * neg.length))))
    // the trained scorer separates its own training labels beyond chance
    assert(row.getLong(3) > 550000L, s"AUC ppm ${row.getLong(3)}")
  }
}
