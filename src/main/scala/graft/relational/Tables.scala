package graft.relational

import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  * One parquet each; read-only.
  */
object Tables {

  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = tpch ++ Seq("events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has been generated as parquet TIMESTAMP(NANOS) in some
      // rounds and TIMESTAMP(MICROS) in others; the engine's contract
      // (every EventQueries consumer, `ts div 1000` → µs) is a raw long
      // of NANOS since epoch. Normalize whatever the lake serves to that
      // one contract here, so a regenerated lake never shifts query
      // semantics. The DuckDB oracle side is already physical-type
      // agnostic (`epoch_us(ts)`).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType => df // TIMESTAMP(NANOS) behind the legacy conf
        case TimestampNTZType =>
          // naive µs: reinterpret the wall-clock value as UTC micros —
          // tz-free by construction (cast NTZ→TZ applies the session
          // zone, which every entrypoint pins to UTC)
          df.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000"))
        case TimestampType =>
          df.withColumn("ts", expr("unix_micros(ts) * 1000"))
        case other =>
          throw new IllegalStateException(
            s"events.ts: unsupported physical type $other")
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view (for the SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
