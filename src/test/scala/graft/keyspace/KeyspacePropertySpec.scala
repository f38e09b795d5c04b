package graft.keyspace

import org.scalacheck.{Gen, Prop, Properties}

/** Property-based invariants (SURVEY §5) for the pure keyspace math and
  * wire codec — no Spark session needed, so hundreds of generated cases
  * per property run in milliseconds and cover lengths the exhaustive
  * specs can't. */
object KeyspacePropertySpec extends Properties("keyspace") {

  private val genLen = Gen.choose(1, Keyspace.MaxLen)
  private def genOrdinal(len: Int): Gen[Long] =
    Gen.choose(0L, Keyspace.size(len) - 1)
  private val genLenOrdinal = genLen.flatMap(l => genOrdinal(l).map((l, _)))

  property("passToNum . numToPass == id over len 1..13") =
    Prop.forAll(genLenOrdinal) { case (len, n) =>
      val s = Keyspace.numToPass(n, len)
      s.length == len &&
        s.forall(c => c >= 'a' && c <= 'z') &&
        Keyspace.passToNum(s) == n
    }

  property("ordinal order == lexicographic order of encodings") =
    Prop.forAll(genLen.flatMap(l =>
      Gen.zip(genOrdinal(l), genOrdinal(l)).map((l, _)))) { case (len, (a, b)) =>
      val (sa, sb) = (Keyspace.numToPass(a, len), Keyspace.numToPass(b, len))
      ((a < b) == (sa < sb)) && ((a == b) == (sa == sb))
    }

  property("wrap variant == numToPass of ordinal mod 26^len") =
    Prop.forAll(genLen, Gen.choose(0L, Long.MaxValue / 2)) { (len, n) =>
      Keyspace.numToPass(n % Keyspace.size(len), len) ==
        Keyspace.numToPass(n, len, wrap = true)
    }

  // the X1 overshoot fix, as a law: tiles are contiguous, disjoint,
  // clamped to [lo, hi], and near-uniform (sizes differ by at most 1)
  property("tile exactly covers [lo, hi]") = {
    val gen = for {
      len <- Gen.choose(2, 6)
      lo <- Gen.choose(0L, Keyspace.size(len) - 2)
      hi <- Gen.choose(lo, Keyspace.size(len) - 1)
      n <- Gen.choose(1, 40)
    } yield (lo, hi, n)
    Prop.forAll(gen) { case (lo, hi, n) =>
      val tiles = Keyspace.tile(lo, hi, n)
      val sizes = tiles.map { case (a, b) => b - a + 1 }
      tiles.head._1 == lo &&
        tiles.last._2 == hi && // no overshoot, unlike server.c:387-433
        tiles.forall { case (a, b) => a <= b } &&
        tiles.sliding(2).forall {
          case Seq((_, b1), (a2, _)) => a2 == b1 + 1
          case _ => true
        } &&
        sizes.sum == hi - lo + 1 &&
        sizes.max - sizes.min <= 1
    }
  }

  property("LSP wire frames round-trip") = {
    import graft.lsp.LspWire
    val gen = for {
      c <- Gen.choose(0L, (1L << 32) - 1)
      s <- Gen.choose(0L, (1L << 32) - 1)
      p <- Gen.containerOf[Array, Byte](Gen.choose(-128, 127).map(_.toByte))
    } yield (c, s, p)
    Prop.forAll(gen) { case (c, s, p) =>
      val row = LspWire.decode(LspWire.encode(c, s, p))
      row.getLong(0) == c && row.getLong(1) == s &&
        java.util.Arrays.equals(row.getBinary(2), p)
    }
  }

  property("hexToBytes inverts hex formatting") =
    Prop.forAll(
      Gen.containerOfN[Array, Byte](20, Gen.choose(-128, 127).map(_.toByte))) { d =>
      val hex = d.map("%02x".format(_)).mkString
      java.util.Arrays.equals(CrackKernels.hexToBytes(hex), d)
    }
}
