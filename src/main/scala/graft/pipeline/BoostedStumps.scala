package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.relational.Tables.load

/** Gradient-boosted depth-1 regression stumps over document features —
  * the model-based scoring primitive between the hand-rule heuristics
  * ([[graft.text.TextOps.qTextQuality]]) and the logistic classifier
  * ([[QualityClassifier]]): `rounds` rounds of "fit the best single
  * threshold split to the residuals, subtract the leaf means".
  *
  * Exact-integer training end-to-end, so the full model (and the
  * residual trajectory) replays bit-for-bit in DuckDB:
  *   - features f1 = token count, f2 = n_chars, f3 = stopword count;
  *     target y = distinct-token count in 10⁶ fixed point;
  *   - candidate thresholds are 7 fixed integer grid points per feature
  *     (`mn + (mx−mn)·i div 8` — data-derived but rank-free, constant
  *     across rounds since features never change);
  *   - split gain is the SSE reduction (S_L·n_R − S_R·n_L)²/(n_L·n_R),
  *     compared across candidates by BigInt cross-multiplication (no
  *     division ever enters the argmax), ties broken by (feature,
  *     threshold);
  *   - leaf values are truncating divisions S div n (Spark `div`,
  *     DuckDB `//`, Java `/` agree on negatives — the q_holt_winters
  *     contract).
  *
  * Scale shape (the [[QualityClassifier]] pattern): each round is ONE
  * map-side-combinable aggregation pass computing all 21 candidate
  * (count, sum) pairs as conditional aggregates — a single collected
  * row of kilobytes — plus one scalar |residual| pass; the argmax runs
  * driver-side on the 21-row census (the model-publish step), and the
  * residual update is a stateless broadcast-literal map. Nothing
  * corpus-sized ever leaves the executors. Headroom: |S·n| ≤ ~10¹⁹
  * needs corpora below ~10⁷ docs at this fixed-point scale — rescale
  * the target for more.
  */
object BoostedStumps {

  private val Features = Seq("f1", "f2", "f3")

  def qBoostedStumps(
      spark: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    import spark.implicits._
    val feats = load(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("f1"),
        col("n_chars").cast("long").as("f2"),
        size(expr("filter(split(text, ' '), t -> t IN ('the', 'a'))"))
          .cast("long").as("f3"),
        (size(array_distinct(split(col("text"), " "))).cast("long")
          * 1000000L).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val b = feats.agg(
        min("f1"), max("f1"), min("f2"), max("f2"), min("f3"), max("f3"))
        .as[(Long, Long, Long, Long, Long, Long)].collect().head
      val grid = Seq(("f1", b._1, b._2), ("f2", b._3, b._4),
        ("f3", b._5, b._6))
      val cands = for {
        (fe, mn, mx) <- grid; i <- 1 to 7
      } yield (fe, mn + (mx - mn) * i / 8)
      var cur = feats.withColumn("r", col("y"))
      val out =
        scala.collection.mutable.Buffer[(Long, String, Long, Long, Long, Long, Long)]()
      for (t <- 1 to rounds) {
        val aggs = cands.flatMap { case (fe, th) =>
          Seq(
            sum(when(col(fe) <= th, 1L).otherwise(0L))
              .as(s"n_${fe}_$th"),
            sum(when(col(fe) <= th, col("r")).otherwise(0L))
              .as(s"s_${fe}_$th"))
        } ++ Seq(count(lit(1)).as("n_all"), sum("r").as("s_all"))
        val row = cur.agg(aggs.head, aggs.tail: _*).collect().head
        val nAll = row.getAs[Long]("n_all")
        val sAll = row.getAs[Long]("s_all")
        val best = cands.flatMap { case (fe, th) =>
          val nl = row.getAs[Long](s"n_${fe}_$th")
          val sl = row.getAs[Long](s"s_${fe}_$th")
          if (nl == 0 || nl == nAll) None
          else {
            val (nr, sr) = (nAll - nl, sAll - sl)
            val num = BigInt(sl) * nr - BigInt(sr) * nl
            Some((fe, th, nl, sl, nr, sr, num * num, BigInt(nl) * nr))
          }
        }.reduceLeft { (a, c) =>
          // a beats c iff gain(a) > gain(c), tiebreak (feature, th) asc
          val cmp = a._7 * c._8 - c._7 * a._8
          if (cmp > 0 || (cmp == 0 &&
            (a._1 < c._1 || (a._1 == c._1 && a._2 <= c._2)))) a
          else c
        }
        val (fe, th, nl, sl, _, sr, _, _) = best
        val (dl, dr) = (sl / nl, sr / (nAll - nl))
        cur = cur.withColumn("r",
          col("r") - when(col(fe) <= th, dl).otherwise(dr))
        val absResid = cur.agg(sum(abs(col("r")))).as[Long].collect().head
        out += ((t.toLong, fe, th, nl, dl, dr, absResid))
      }
      spark.createDataFrame(out.toSeq).toDF(
        "step", "feature", "threshold", "n_left", "left_fp", "right_fp",
        "abs_resid")
    } finally feats.unpersist(blocking = false)
  }
}
