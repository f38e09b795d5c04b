package graft.crack

import org.apache.spark.sql.SparkSession

/** CLI parity binary for the reference's user entry point: the reference
  * ships `./request host:port <sha1_hex> <len>` (`request.c:27-80`,
  * built by `Makefile:10-12`) which prints the worker's verdict — `f
  * <pass>` on a hit (`worker.c:84-91`) or `x` when the keyspace is
  * exhausted (`worker.c:103-106`). This main is the same contract minus
  * the transport: the cluster IS the Spark session, so argv drops the
  * `host:port` and the verdict prints straight to stdout.
  *
  * Usage: `graft.crack.Main <sha1_hex> <len> [parallelism]`
  *
  * Exit codes: 0 on a clean run (found or not — the reference's
  * `puts(ret_msg)` reports both the same way), 2 on bad arguments.
  */
object Main {

  private[crack] val usage: String =
    "usage: graft.crack.Main <sha1_hex> <len 1..13> [parallelism]"

  private[crack] case class Job(hash: String, len: Int, parallelism: Int)

  /** Argv validation, separate from execution so bad arguments never pay
    * session startup (and the suite can exercise it sessionless). */
  private[crack] def parse(args: Array[String]): Either[String, Job] =
    if (args.length != 2 && args.length != 3) Left(usage)
    else {
      val hash = args(0).toLowerCase
      if (!hash.matches("[0-9a-f]{40}"))
        Left(s"not a sha1 hex digest: '${args(0)}'\n$usage")
      else args(1).toIntOption.filter(l => l >= 1 && l <= 13) match {
        case None => Left(s"bad length: '${args(1)}'\n$usage")
        case Some(len) =>
          val par =
            if (args.length == 3) args(2).toIntOption.filter(_ >= 1)
            else Some(32)
          par.toRight(s"bad parallelism: '${args(2)}'\n$usage")
            .map(p => Job(hash, len, p))
      }
    }

  /** The verdict line: `f <pass>` on a hit, `x` on exhaustion —
    * byte-identical to `worker.c:84-106`'s reply payload. */
  private[crack] def verdict(spark: SparkSession, job: Job): String =
    CrackQuery.crack(spark, job.hash, job.len, job.parallelism)
      .map(p => s"f $p").getOrElse("x")

  def main(args: Array[String]): Unit = parse(args) match {
    case Left(msg) =>
      System.err.println(msg)
      sys.exit(2)
    case Right(job) =>
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
        .appName("graft-crack")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      try println(verdict(spark, job))
      finally spark.stop()
  }
}
