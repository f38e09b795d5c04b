package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

/** The seen-file-set offset must survive Spark's offset log, which is
  * line-oriented and replayed verbatim on restart: serialization must be
  * newline-free and parse must invert quote for ANY file name. */
object SeenOffsetPropertySpec extends Properties("seenoffset") {

  // names as the filesystem could produce them, plus hostile characters
  // a producer could sneak in (quotes, backslashes, control chars,
  // non-ASCII) — everything except '/' and NUL, which no POSIX file
  // name can contain
  private val genName: Gen[String] = Gen.nonEmptyListOf(Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('.', '-', '_', '='),
    1 -> Gen.oneOf('"', '\\', '\n', '\r', '\t', ' ', 'é', '中'),
    1 -> Gen.choose(1.toChar, 31.toChar)
  )).map(_.mkString)

  property("json round-trips any set of names") =
    Prop.forAll(Gen.listOf(genName)) { names =>
      val set = names.toSet
      LspSeenOffset.parse(LspSeenOffset(set).json()).names == set
    }

  property("json is single-line (offset-log safe)") =
    Prop.forAll(Gen.listOf(genName)) { names =>
      val j = LspSeenOffset(names.toSet).json()
      !j.contains('\n') && !j.contains('\r')
    }

  property("equal sets serialize identically (batch-due comparison)") =
    // the permutation seed comes from the generator, so a failure replays
    // from ScalaCheck's reported seed (an unseeded shuffle would not)
    Prop.forAll(Gen.listOf(genName), Gen.long) { (names, seed) =>
      val a = LspSeenOffset(names.toSet).json()
      val b = LspSeenOffset(
        new scala.util.Random(seed).shuffle(names).reverse.toSet).json()
      a == b
    }
}
