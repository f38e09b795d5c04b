import org.apache.spark.sql.functions._
val out = new java.io.PrintWriter("/tmp/PLANS.md")
def dump(title: String, note: String, df: org.apache.spark.sql.DataFrame): Unit = {
  df.collect()
  out.println(s"## $title\n\n$note\n\n```")
  out.println(df.queryExecution.executedPlan.toString.trim)
  out.println("```\n")
}
out.println("# Physical plans of headline queries (sf0.001, local[8], AQE final plans)\n")
out.println("Regenerate: `spark-shell -I tools/gen_plans.scala` with the packaged jar.\n")
dump("Crack scan (the reference's query)", "One whole-stage-codegen stage: Range -> fused sha1-ordinal filter -> project-on-hit. No exchange, no per-candidate allocation.", graft.crack.CrackQuery.matches(spark, "81fe8bfe87576c3ecb22426f8e57847382917acf", 4))
dump("TPC-H Q5-shape join (q5_local_supplier)", "All dimension joins broadcast; the only exchange is the final group-by.", graft.relational.RelationalQueries.q5LocalSupplierVolume(spark, "/root/testdata/sf0.001"))
dump("Native top-k (q_topk_native)", "PartialTopK (map-side heaps) -> Exchange -> FinalTopK; no sort touches more than k rows per key.", graft.relational.RelationalQueries.qTopKNative(spark, "/root/testdata/sf0.001"))
dump("As-of join (q_asof_join)", "Union + running-last over one shuffle on user_id; no pair blowup.", graft.relational.EventQueries.qAsofJoin(spark, "/root/testdata/sf0.001"))
dump("Banded embedding near-dup (q_embedding_neardup)", "Sign-signature bands make candidate generation a (band, bval) EQUI-join — the round-2 nested-loop theta join is gone; verification joins are broadcasts of the small vector table.", graft.similarity.Similarity.qEmbeddingNearDup(spark, "/root/testdata/sf0.001"))
dump("Length-banded edit distance (q_edit_distance)", "Compound (brand, length +/- 3) blocking as a pure equi-join with a thresholded early-exit levenshtein on the survivors.", graft.dedup.Dedup.qEditDistancePairs(spark, "/root/testdata/sf0.001"))
out.close()
println("WROTE=/tmp/PLANS.md")
System.exit(0)
