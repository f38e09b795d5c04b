package graft.crack

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.num_to_pass
import graft.keyspace.Keyspace

/** Batch re-expression of the reference's one parameterized query
  * (SURVEY.md §0):
  *
  * {{{
  * SELECT password FROM generate_keyspace(len)
  * WHERE sha1_hex(password) = :target_hash
  * LIMIT 1
  * }}}
  *
  * The whole request/server/worker round-trip (`request.c`, `server.c`,
  * `worker.c`) collapses into one whole-stage-codegen'd Spark job:
  * `Range → Project(NumToPass) → Filter(sha1 = h) → TakeOrdered(1)`.
  * `spark.range` supplies the reference's uniform range partitioning
  * (`server.c:333-438`) exactly — ordinal tiling with no overshoot — at
  * arbitrary parallelism instead of the reference's cap of 10(+1) workers.
  */
object CrackQuery {

  /** Generated keyspace scan over ordinals `[lo, hi]` inclusive
    * (S1/S2: `worker.c:77-101`, `request.c:40-47`). Splittable, ordered,
    * codegen'd via `RangeExec`. */
  def candidates(
      spark: SparkSession,
      len: Int,
      lo: Long,
      hi: Long,
      parallelism: Int): DataFrame = {
    require(lo >= 0 && hi < Keyspace.size(len) && lo <= hi,
      s"bounds [$lo, $hi] invalid for len=$len")
    spark.range(lo, hi + 1, 1, parallelism)
      .select(num_to_pass(col("id"), len).as("pass"))
  }

  /** Full-domain candidate scan (`lower="a"*len`, `upper="z"*len`). */
  def candidates(spark: SparkSession, len: Int, parallelism: Int = 32): DataFrame = {
    val (lo, hi) = Keyspace.fullRange(len)
    candidates(spark, len, lo, hi, parallelism)
  }

  /** All matches in `[a-z]^len` for `target` (usually 0 or 1 rows for
    * SHA-1). Deterministic: ordered by candidate. */
  def matches(
      spark: SparkSession,
      hashHex: String,
      len: Int,
      parallelism: Int = 32): DataFrame = {
    val (lo, hi) = Keyspace.fullRange(len)
    matchesOrdinals(spark, hashHex, len, lo, hi, parallelism)
  }

  /** The crack hot scan: filter ordinals through the fused
    * [[graft.keyspace.Sha1OrdinalMatch]] kernel (no candidate string /
    * hex / digest allocation per row — measured ~2x the
    * `sha1(num_to_pass(..)) = hex` pipeline), then materialize `pass`
    * for the (0 or 1) hits only. */
  def matchesOrdinals(
      spark: SparkSession,
      hashHex: String,
      len: Int,
      lo: Long,
      hi: Long,
      parallelism: Int): DataFrame =
    spark.range(lo, hi + 1, 1, parallelism)
      .filter(graft.functions.sha1_ordinal_match(col("id"), len, hashHex))
      .select(num_to_pass(col("id"), len).as("pass"))

  /** First-found-wins crack (A1/L3). Unlike the reference — racy: whichever
    * worker replies first wins, `server.c:275-306` — this is deterministic:
    * the lexicographically smallest preimage. Empty result ≅ reply "x". */
  def crackDF(
      spark: SparkSession,
      hashHex: String,
      len: Int,
      parallelism: Int = 32): DataFrame =
    matches(spark, hashHex, len, parallelism).orderBy("pass").limit(1)

  /** `./request host:port <hash> <len>` ≅ `crack(hash, len)`:
    * `Some(pass)` ≅ "f <pass>", `None` ≅ "x". */
  def crack(
      spark: SparkSession,
      hashHex: String,
      len: Int,
      parallelism: Int = 32): Option[String] =
    crackDF(spark, hashHex, len, parallelism)
      .collect().headOption.map(_.getString(0))

  /** Generalization the reference lacks: crack a whole batch of target
    * hashes in ONE keyspace scan. Fused form: the
    * [[graft.keyspace.Sha1MultiOrdinalMatch]] kernel binary-searches the
    * sorted digest batch per candidate (one SHA-1 + log2(B) 20-byte
    * compares), so the scan cost is independent of batch size;
    * [[crackManyJoin]] keeps the equivalent broadcast-join formulation
    * (the `msgs ⋈ broadcast(workers)` pattern, SURVEY.md §2.4). */
  def crackMany(
      spark: SparkSession,
      hashes: Seq[String],
      len: Int,
      parallelism: Int = 32): DataFrame = {
    if (hashes.isEmpty) {
      // nothing to crack is a normal empty result, not an error
      // (malformed hex IS an error — a digest that can never match is a
      // caller bug that silence would hide)
      import spark.implicits._
      return Seq.empty[(String, String)].toDF("hash", "pass")
    }
    val expr = graft.keyspace.Sha1MultiOrdinalMatch(
      org.apache.spark.sql.GraftShim.expression(col("id")), len, hashes)
    val hexBySlot = expr.sortedHex.toArray
    val (lo, hi) = Keyspace.fullRange(len)
    spark.range(lo, hi + 1, 1, parallelism)
      .withColumn("slot", org.apache.spark.sql.GraftShim.column(expr))
      .filter(col("slot") >= 0)
      .select(element_at(lit(hexBySlot), col("slot") + 1).as("hash"),
        num_to_pass(col("id"), len).as("pass"))
      .groupBy("hash")
      .agg(min("pass").as("pass"))
  }

  /** Broadcast-join formulation of [[crackMany]] (J1 parity pattern). */
  def crackManyJoin(
      spark: SparkSession,
      hashes: Seq[String],
      len: Int,
      parallelism: Int = 32): DataFrame = {
    import spark.implicits._
    val targets = hashes.map(_.toLowerCase).toDF("hash")
    candidates(spark, len, parallelism)
      .join(broadcast(targets), sha1(col("pass")) === col("hash"))
      .groupBy("hash")
      .agg(min("pass").as("pass"))
  }

  /** Multi-length search — the generalization SURVEY.md §2.11 flags as
    * needing a generator: the keyspace becomes the union of `[a-z]^len`
    * for each candidate length. Expressed as a union of range scans (NOT
    * an exploded sequence — materializing a 26^len-element array per row
    * would not survive scale). Returns all matches with their length;
    * deterministic order by (len, pass). */
  def crackLens(
      spark: SparkSession,
      hashHex: String,
      lens: Seq[Int],
      parallelism: Int = 32): DataFrame = {
    require(lens.nonEmpty)
    lens.map { len =>
      val (lo, hi) = Keyspace.fullRange(len)
      matchesOrdinals(spark, hashHex, len, lo, hi, parallelism)
        .select(lit(len).as("len"), col("pass"))
    }.reduce(_.unionAll(_))
      .orderBy("len", "pass")
  }

  /** Cancel-on-first-hit driver loop (SURVEY.md §7.4): scan the keyspace in
    * ordinal chunks; work beyond the hit's chunk is never launched, and
    * WITHIN the hit's chunk sibling tasks are killed via
    * [[cancellingScan]] as soon as the hit's task completes. Strictly
    * better than the reference, which replies early (`server.c:251-256`)
    * but never cancels sibling workers (`worker.c` has no abort path).
    *
    * Determinism contract (inherited from [[cancellingScan]]): assumes at
    * most one preimage per chunk — true for any cryptographic digest.
    * With multiple preimages in ONE chunk the cancelled scan may return
    * whichever hit reported first, where the pre-cancellation version
    * returned the chunk minimum; callers needing the global minimum under
    * colliding inputs use [[crackDF]] (full ordered scan). */
  def chunkedCrack(
      spark: SparkSession,
      hashHex: String,
      len: Int,
      chunkSize: Long = 1L << 24,
      parallelism: Int = 32): Option[String] = {
    val (lo, hi) = Keyspace.fullRange(len)
    var start = lo
    while (start <= hi) {
      val end = math.min(start + chunkSize - 1, hi)
      val hit = cancellingScan(spark, hashHex, len, start, end, parallelism)
      if (hit.isDefined) return hit
      start = end + 1
    }
    None
  }

  /** One crack scan of `[lo, hi]` that CANCELS its own sibling tasks on
    * the first hit (L3 completion): tiles run as one job in a dedicated
    * job group; a hit task publishes the preimage through an accumulator
    * before completing, a driver-side listener cancels the group on the
    * first hit-carrying task completion, and in-flight tasks notice the
    * interrupt at their next 64k-candidate check and die. Queued tiles
    * are never launched — measured in CrackSpec as tasks-started <
    * tiles for an early hit.
    *
    * The per-candidate kernel is the same [[graft.keyspace.CrackKernels
    * .sha1MatchesOrdinal]] the codegen'd scan calls, so cancellability
    * costs no throughput. Result is the minimum over reported hits —
    * identical to the ordered scan whenever the digest has at most one
    * preimage in the range (any cryptographic hash in practice; with
    * multiple preimages a cancelled scan may legitimately return
    * whichever hit reported, so callers needing the global minimum use
    * [[matchesOrdinals]] + orderBy). */
  def cancellingScan(
      spark: SparkSession,
      hashHex: String,
      len: Int,
      lo: Long,
      hi: Long,
      parallelism: Int): Option[String] = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val sc = spark.sparkContext
    val tiles = Keyspace.tile(lo, hi, parallelism)
    val hits = sc.collectionAccumulator[String]("graft.crack.hits")
    val group = s"graft-crack-cancel-${java.util.UUID.randomUUID()}"
    @volatile var fired = false
    val listener = new SparkListener {
      override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit =
        // accumulator updates merge before the event posts, so a hit is
        // visible here the moment its task ends
        if (!fired && !hits.isZero) {
          fired = true
          sc.cancelJobGroup(group)
        }
    }
    sc.addSparkListener(listener)
    try {
      sc.setJobGroup(group, s"crack $hashHex len=$len", interruptOnCancel = true)
      val collected =
        try {
          sc.parallelize(tiles, tiles.size).flatMap { case (s, e) =>
            scanTileCancellable(hashHex, len, s, e) match {
              case Some(p) => hits.add(p); Iterator.single(p)
              case None => Iterator.empty
            }
          }.collect().toSeq
        } catch {
          case e: org.apache.spark.SparkException if fired =>
            // expected path: job killed after the hit; the accumulator
            // carries every hit whose task completed
            val v = hits.value
            if (v.isEmpty) throw e
            import scala.jdk.CollectionConverters._
            v.asScala.toSeq
        }
      collected.sorted.headOption
    } finally {
      sc.clearJobGroup()
      sc.removeSparkListener(listener)
    }
  }

  /** Worker tile loop with a cooperative cancellation point every 64k
    * candidates — `interruptOnCancel` kills via `Thread.interrupt`, which
    * a pure compute loop would otherwise never observe. */
  private def scanTileCancellable(
      hashHex: String, len: Int, lo: Long, hi: Long): Option[String] = {
    val target = graft.keyspace.CrackKernels.hexToBytes(hashHex.toLowerCase)
    var ord = lo
    while (ord <= hi) {
      if (graft.keyspace.CrackKernels.sha1MatchesOrdinal(ord, len, target))
        return Some(Keyspace.numToPass(ord, len))
      ord += 1
      if ((ord & 0xffffL) == 0L && Thread.currentThread().isInterrupted)
        throw new InterruptedException(s"crack tile [$lo,$hi] cancelled")
    }
    None
  }
}
