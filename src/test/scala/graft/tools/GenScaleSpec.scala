package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The sf1 upsampler's shape contract ([[GenScale]] scaladoc) — the
  * scale leg's verdicts are only as meaningful as these properties:
  * a broken key shift fakes join blowups, verbatim text/embedding
  * copies fake quadratic dedup/ANN cliffs, and a changed hour spine
  * fakes window growth. Generated once at sf0.001 × 2 copies into a
  * temp dir. */
class GenScaleSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"
  private lazy val dst = {
    val d = java.nio.file.Files.createTempDirectory("genscale_spec").toString
    GenScale.ensure(spark, src, d, copies = 2)
    d
  }

  private def t(dir: String, name: String) =
    spark.read.parquet(s"$dir/$name.parquet")

  test("fact tables scale by copies; dimensions stay fixed") {
    for (n <- Seq("customer", "orders", "lineitem", "part", "supplier",
        "events", "documents", "embeddings"))
      assert(t(dst, n).count() === 2 * t(src, n).count(), n)
    for (n <- Seq("region", "nation"))
      assert(t(dst, n).count() === t(src, n).count(), n)
  }

  test("key shifts keep per-copy join fan-out; copies never collide") {
    // orders ⋈ lineitem fan-out must scale exactly with copies — a
    // one-sided shift would orphan a copy's foreign keys (fan-out
    // shrinks) or cross-join copies (fan-out grows)
    def fanout(dir: String): Long =
      t(dir, "lineitem").join(t(dir, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(fanout(dst) === 2 * fanout(src))
    // key spaces of the two copies are disjoint
    val keys = t(dst, "orders").select("o_orderkey")
    assert(keys.distinct().count() === keys.count())
  }

  test("document copies share ZERO shingles with the original") {
    val sh = t(dst, "documents")
      .select(col("doc_id"), explode(
        graft.functions.shingle_set(col("text"), 4)).as("sh"))
    val cross = sh.filter(col("doc_id") < 100000000L).as("a")
      .join(sh.filter(col("doc_id") >= 100000000L).as("b"),
        col("a.sh") === col("b.sh"))
    assert(cross.count() === 0L,
      "verbatim cross-copy shingles would fake quadratic near-dup pairs")
    // within-copy duplicate structure preserved: same distinct-text
    // census in both copies
    val byCopy = t(dst, "documents")
      .groupBy((col("doc_id") >= 100000000L).as("c"))
      .agg(countDistinct(col("text")).as("d"))
      .collect().map(_.getLong(1)).toSeq
    assert(byCopy.distinct.size === 1, byCopy)
  }

  test("embedding copies are proper rotations: norms equal, vectors differ") {
    val e = t(dst, "embeddings")
      .select(col("vec_id"), col("embedding"),
        round(sqrt(graft.functions.vec_dot(col("embedding"),
          col("embedding"))), 4).as("nrm"))
    val a = e.filter(col("vec_id") < 100000000L)
      .select(col("vec_id").as("id"), col("embedding").as("ea"),
        col("nrm").as("na"))
    val b = e.filter(col("vec_id") >= 100000000L)
      .select((col("vec_id") - 100000000L).as("id"),
        col("embedding").as("eb"), col("nrm").as("nb"))
    val j = a.join(b, "id")
    assert(j.filter(col("na") =!= col("nb")).count() === 0L,
      "rotation must preserve the norm")
    assert(j.filter(col("ea") === col("eb")).count() === 0L,
      "verbatim embedding copies would fake exact ANN ties")
  }

  test("events keep the calendar hour spine (10x traffic, not 10x hours)") {
    def hours(dir: String) = t(dir, "events")
      .select(expr("date_trunc('hour', ts)").as("h")).distinct()
    assert(hours(dst).count() === hours(src).count())
  }

  test("generation is marker-idempotent (reuse, no rewrite)") {
    val before = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(dst, "_GENSCALE_DONE"))
    GenScale.ensure(spark, src, dst, copies = 2)
    val after = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(dst, "_GENSCALE_DONE"))
    assert(before === after)
  }

  test("key-headroom guard: a source key at/over KeyOffset fails loudly") {
    import spark.implicits._
    // in range: passes (max key one below the offset)
    GenScale.assertKeyHeadroom(
      Seq((99999999L, 1L)).toDF("event_id", "user_id"), "events")
    // at the offset: copy 0 and copy 1 key spaces would collide
    val ex = intercept[IllegalArgumentException] {
      GenScale.assertKeyHeadroom(
        Seq((100000000L, 1L)).toDF("event_id", "user_id"), "events")
    }
    assert(ex.getMessage.contains("collide"), ex.getMessage)
    // empty tables have no keys to collide
    GenScale.assertKeyHeadroom(
      Seq.empty[(Long, Long)].toDF("event_id", "user_id"), "events")
  }

  test("embedding copies past 2*(dim-1) fail loudly (rotation-cycle bound)") {
    // at copies >= 2*(dim-1)+1 the rotation+negation scheme repeats
    // cycle 0 verbatim, reviving the cross-copy ANN-tie artifact — the
    // guard must trip BEFORE any table is written (r15 ADVICE)
    import spark.implicits._
    // tiny dim-4 embeddings: bound = 2*(4-1) = 6
    val emb = Seq((0L, Seq(1f, 2f, 3f, 4f)), (1L, Seq(4f, 3f, 2f, 1f)))
      .toDF("vec_id", "embedding")
    GenScale.assertEmbeddingCopyBound(emb, 6) // at the bound: fine
    val ex = intercept[IllegalArgumentException] {
      GenScale.assertEmbeddingCopyBound(emb, 7)
    }
    assert(ex.getMessage.contains("decorrelation bound"), ex.getMessage)
    // the real builds stay comfortably inside the dim-64 bound of 126
    GenScale.assertEmbeddingCopyBound(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"), 100)
  }
}
