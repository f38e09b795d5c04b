package graft.dedup

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.relational.Tables

/** Exact substring deduplication — the ExactSubstr policy of
  * "Deduplicating Training Data Makes Language Models Better" (Lee et
  * al., 2022), re-expressed relationally: any token span of `L` tokens
  * that occurs at more than one position in the corpus keeps ONLY its
  * globally-first occurrence (lexicographic (doc_id, pos)); every later
  * occurrence's tokens are removed from their documents. Unlike
  * document-level dedup (MinHash/SimHash/exact-hash), this deletes the
  * duplicated PASSAGE while keeping the rest of the document — the
  * boilerplate-header / license-block / mirrored-quote case.
  *
  * The reference implementation builds a corpus-wide suffix array; the
  * Spark-first equivalence is: a token is part of a duplicated run of
  * >= L tokens iff one of the <= L fixed-width shingles covering it is
  * duplicated, so the position-indexed L-shingle relation (one row per
  * token position, emitted by the native codegen
  * [[graft.text.TextExpressions.shingleList shingle_list]] kernel)
  * carries the whole computation — no suffix sort, no driver state.
  *
  * Scale shape: ONE corpus-sized shuffle, on the gram key, for the
  * duplicate census; the `count >= 2` gate is applied inside that
  * aggregation, so only duplicated grams (a tiny fraction of the corpus)
  * flow into the occurrence join. Token-level work after the census is
  * proportional to AFFECTED documents only: untouched docs pass through
  * with their original text and never explode to token granularity. The
  * span merge is a per-doc window over removed token indices (removed
  * tokens only, not the corpus). All outputs are integers or rebuilt
  * strings — no floats anywhere, so the oracle is exact by construction.
  */
object SubstrDedup {

  import Tables.load

  /** Duplicated-span width in tokens (the reference uses 50 on web
    * corpora; 8 fits this corpus' ~100-token documents). */
  val SpanTokens = 8

  /** Per-document dedup verdict over an arbitrary `(doc_id, text)`
    * frame: token counts, merged duplicated-span stats, and the text
    * with later-occurrence spans removed. */
  def exactSubstrDedup(docs: DataFrame, ell: Int): DataFrame = {
    // one row per token position, carrying the L-gram starting there
    val occ = docs.select(col("doc_id"),
      posexplode(graft.functions.shingle_list(col("text"), ell)))
      .toDF("doc_id", "pos", "g")
      .withColumn("pos", col("pos").cast("long"))
    // duplicate census: per duplicated gram, its globally-first
    // occurrence; the >=2 gate keeps this relation duplicated-grams-sized
    val dupFirsts = occ.groupBy("g")
      .agg(count(lit(1)).as("n_occ"),
        min(struct(col("doc_id"), col("pos"))).as("first"))
      .filter(col("n_occ") >= 2)
      .select("g", "first")
    // every non-first occurrence of a duplicated gram
    val later = occ.join(dupFirsts, "g")
      .filter(struct(col("doc_id"), col("pos")) =!= col("first"))
    // the removed token set: indices covered by any later occurrence
    val removed = later.select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(ell - 1))).as("idx"))
      .distinct()
    // gaps-and-islands: contiguous removed indices merge into one span
    val w = Window.partitionBy("doc_id").orderBy("idx")
    val stats = removed
      .withColumn("isl", col("idx") - row_number().over(w))
      .groupBy(col("doc_id"), col("isl"))
      .agg(count(lit(1)).as("sl"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_spans"), sum("sl").as("n_dup_tokens"))
    // rebuild ONLY affected docs: surviving tokens rejoined in order
    val rebuilt = docs.join(stats.select("doc_id"), "doc_id")
      .select(col("doc_id"),
        posexplode(graft.text.TextOps.tokens(col("text"))))
      .toDF("doc_id", "idx", "tok")
      .withColumn("idx", col("idx").cast("long"))
      .join(removed, Seq("doc_id", "idx"), "left_anti")
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("idx"), col("tok")))),
          x => x.getField("tok")), " ").as("clean_text"))
    docs
      .select(col("doc_id"), col("text"),
        size(graft.text.TextOps.tokens(col("text"))).cast("long")
          .as("n_tokens"))
      .join(stats, Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        // affected doc whose every token was removed -> empty string
        // (rebuilt has no row: the group never formed)
        when(col("n_dup_spans").isNull, col("text"))
          .otherwise(coalesce(col("clean_text"), lit("")))
          .as("clean_text"))
  }

  /** Corpus-wide exact substring dedup over the documents table. */
  def qSubstrDedup(spark: SparkSession, dir: String): DataFrame =
    exactSubstrDedup(load(spark, dir, "documents"), SpanTokens)
}
