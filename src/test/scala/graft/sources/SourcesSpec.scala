package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Source/sink format coverage beyond parquet: CSV, JSON lines, and ORC
  * round-trips with explicit schemas (schema inference is a scan of the
  * whole input — never acceptable at 100 TB, so every read here declares
  * its schema up front). */
class SourcesSpec extends SparkSpec {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def sample = {
    import spark.implicits._
    Seq((1L, "alpha", 1.5), (2L, "beta", -2.25), (3L, "with,comma", 0.0))
      .toDF("id", "name", "score")
  }

  test("CSV round-trip: header, explicit schema, quoting, compression") {
    val dir = tmp("graft_csv")
    sample.write.mode("overwrite")
      .option("header", "true").option("compression", "gzip").csv(dir)
    val back = spark.read
      .schema("id LONG, name STRING, score DOUBLE")
      .option("header", "true").csv(dir)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet === sample.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet)
  }

  test("JSON lines round-trip with explicit schema and corrupt-record mode") {
    val dir = tmp("graft_json")
    sample.write.mode("overwrite").json(dir)
    // append a malformed line: PERMISSIVE mode must null it, not fail the job
    val f = new java.io.File(dir, "bad.json")
    val w = new java.io.PrintWriter(f)
    try w.println("""{"id": "not-a-long"}""") finally w.close()
    val back = spark.read
      .schema("id LONG, name STRING, score DOUBLE")
      .option("mode", "PERMISSIVE").json(dir)
    assert(back.count() === 4)
    assert(back.filter(col("id").isNull).count() === 1)
  }

  test("ORC round-trip preserves types and supports predicate pushdown") {
    val dir = tmp("graft_orc")
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).filter(col("id") >= 2)
    assert(back.count() === 2)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual"),
      plan)
  }
}
