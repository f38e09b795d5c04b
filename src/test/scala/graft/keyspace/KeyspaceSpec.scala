package graft.keyspace

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.functions.{num_to_pass, num_to_pass_wrap, pass_to_num}

class KeyspaceSpec extends SparkSpec {

  private val rng = new scala.util.Random(42)
  private def randLen(): Int = 1 + rng.nextInt(Keyspace.MaxLen)
  private def randOrd(len: Int): Long = math.abs(rng.nextLong()) % Keyspace.size(len)

  test("passToNum ∘ numToPass == identity on [0, 26^len)") {
    (1 to 2000).foreach { _ =>
      val len = randLen()
      val n = randOrd(len)
      assert(Keyspace.passToNum(Keyspace.numToPass(n, len)) === n)
    }
  }

  test("ordinal order == lexicographic order (monotone codec)") {
    (1 to 2000).foreach { _ =>
      val len = randLen()
      val (a, b) = (randOrd(len), randOrd(len))
      val (sa, sb) = (Keyspace.numToPass(a, len), Keyspace.numToPass(b, len))
      assert((a < b) === (sa < sb) && (a == b) === (sa == sb))
    }
  }

  test("known vectors: domain min/max, successor semantics") {
    assert(Keyspace.numToPass(0L, 2) === "aa")
    assert(Keyspace.numToPass(675L, 2) === "zz")
    assert(Keyspace.numToPass(1L, 2) === "ab")
    // reference X1-overshoot regression (FIXTURES.md §1): ordinal 679 at
    // len=2 wraps to "ad" under reference mod semantics
    assert(Keyspace.numToPass(679L, 2, wrap = true) === "ad")
    intercept[IllegalArgumentException](Keyspace.numToPass(676L, 2))
    intercept[IllegalArgumentException](Keyspace.numToPass(-1L, 2))
    assert(Keyspace.passToNum("zz") === 675L)
    // all-z successor: reference UB (worker.c:28-38); ours is just +1 out of range
    assert(Keyspace.passToNum("zz") + 1 === Keyspace.size(2))
  }

  test("passToNum rejects invalid input; boxed variant returns null") {
    intercept[IllegalArgumentException](Keyspace.passToNum("aZ"))
    intercept[IllegalArgumentException](Keyspace.passToNum(""))
    intercept[IllegalArgumentException](Keyspace.passToNum("a" * 14))
    assert(Keyspace.passToNumBoxed(
      org.apache.spark.unsafe.types.UTF8String.fromString("a1")) === null)
  }

  test("tile exactly covers [lo, hi], disjoint, sizes differ by <= 1") {
    (1 to 500).foreach { _ =>
      val lo = rng.nextLong(1000000L)
      val span = 1L + rng.nextLong(100000L)
      val n = 1 + rng.nextInt(64)
      val hi = lo + span - 1
      val t = Keyspace.tile(lo, hi, n)
      assert(t.head._1 === lo && t.last._2 === hi)
      t.sliding(2).foreach {
        case Seq((_, e), (s, _)) => assert(s === e + 1)
        case _ =>
      }
      val sizes = t.map { case (s, e) => e - s + 1 }
      assert(sizes.max - sizes.min <= 1)
      assert(t.size === math.min(n.toLong, span))
    }
  }

  test("tile regression: reference overshoot case (len=2, 10 partitions)") {
    // reference: per=67, last sub-upper ordinal 679 > 675 → wraps to "ad",
    // last worker never terminates (server.c:387-433 + worker.c:93-96).
    val t = Keyspace.tile(0L, 675L, 10)
    assert(t.last._2 === 675L)
    assert(t.map { case (s, e) => e - s + 1 }.sum === 676L)
  }

  test("Catalyst expressions round-trip on DataFrame (codegen path)") {
    val df = spark.range(0, Keyspace.size(3))
      .select(col("id"), num_to_pass(col("id"), 3).as("pass"))
      .withColumn("back", pass_to_num(col("pass")))
    assert(df.filter(col("back") =!= col("id")).count() === 0)
    assert(df.count() === 17576L)
  }

  test("SQL function registration + wrap semantics + null propagation") {
    graft.functions.registerAll(spark)
    val row = spark.sql(
      "SELECT num_to_pass(1L, 2) AS p, pass_to_num('ab') AS n, pass_to_num('A1') AS bad"
    ).collect()(0)
    assert(row.getString(0) === "ab")
    assert(row.getLong(1) === 1L)
    assert(row.isNullAt(2))
    // wrap variant reproduces reference mod semantics
    val w = spark.range(679, 680)
      .select(num_to_pass_wrap(col("id"), 2).as("p")).collect()(0).getString(0)
    assert(w === "ad")
  }
}
