package graft.crack

import graft.SparkSpec

/** The packaged CLI's contract: FIXTURES §1 known-answer vectors through
  * the verdict core (`f <pass>` / `x`, `worker.c:84-106` format), plus
  * argv validation (`request.c:27-36`'s usage gate). */
class MainSpec extends SparkSpec {

  private val vectors = Seq(
    // (len, sha1_hex, expected verdict)
    (2, "e0c9035898dd52fc65c41454cec9c4d2611bfb37", "f aa"),
    (2, "d7dacae2c968388960bf8970080a980ed5c5dcb7", "f zz"),
    (2, "da23614e02469a0d7c7bd1bdab5c9c474b1904dc", "f ab"),
    (4, "70c881d4a26984ddce795f6f71817c9cf4480e79", "f aaaa"),
    (4, "81fe8bfe87576c3ecb22426f8e57847382917acf", "f abcd"),
    (4, "a94a8fe5ccb19ba61c4c0873d391e987982fbbd3", "f test"),
    (4, "7110eda4d09e062aa5e4a390b0a572ac0d2c0220", "x")) // sha1("1234")

  test("known-answer vectors produce the reference's verdict lines") {
    vectors.foreach { case (len, hash, expected) =>
      val job = Main.parse(Array(hash, len.toString))
      assert(job.isRight, s"$hash/$len: ${job.left}")
      assert(Main.verdict(spark, job.toOption.get) === expected,
        s"$hash len=$len")
    }
  }

  test("parallelism argument is honored and verdicts are unchanged") {
    val j = Main.parse(Array(
      "81fe8bfe87576c3ecb22426f8e57847382917acf", "4", "7"))
    assert(j === Right(Main.Job(
      "81fe8bfe87576c3ecb22426f8e57847382917acf", 4, 7)))
    assert(Main.verdict(spark, j.toOption.get) === "f abcd")
  }

  test("argv validation: arity, hex shape, length range, parallelism") {
    assert(Main.parse(Array.empty[String]).isLeft)
    assert(Main.parse(Array("onlyone")).isLeft)
    assert(Main.parse(Array("a", "b", "c", "d")).isLeft)
    // not 40 hex chars
    assert(Main.parse(Array("nothex", "4")).swap.toOption.get
      .contains("not a sha1 hex digest"))
    // uppercase hex is accepted (lowercased), matching worker.c's %02x
    assert(Main.parse(Array(
      "81FE8BFE87576C3ECB22426F8E57847382917ACF", "4")).isRight)
    assert(Main.parse(Array(
      "81fe8bfe87576c3ecb22426f8e57847382917acf", "0")).swap.toOption.get
      .contains("bad length"))
    assert(Main.parse(Array(
      "81fe8bfe87576c3ecb22426f8e57847382917acf", "14")).swap.toOption.get
      .contains("bad length"))
    assert(Main.parse(Array(
      "81fe8bfe87576c3ecb22426f8e57847382917acf", "4", "zero")).swap
      .toOption.get.contains("bad parallelism"))
  }
}
