package graft.relational

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew mitigation for large joins. AQE's skew-join handles most cases at
  * runtime; explicit salting remains the tool when one hot key dominates a
  * shuffle (the reference's static uniform split has the same failure mode
  * — a straggler worker — and no answer for it: its rescheduler is an
  * unimplemented stub, `server.c:440-447`).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways: each big-side
    * row gets a deterministic salt from its full row content, the small
    * side is replicated once per salt, and the join key becomes
    * (key, salt) — splitting a hot key across `salts` reducers. Result
    * multiset is identical to the plain join.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1)
    val bigCols: Array[Column] = big.columns.map(col)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(bigCols: _*)), lit(salts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt").drop(replicated(key))
  }
}
