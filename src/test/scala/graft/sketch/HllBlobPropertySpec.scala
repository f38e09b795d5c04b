package graft.sketch

import org.scalacheck.{Gen, Prop, Properties}

/** Algebraic laws of the packed HLL register blob — the properties the
  * HyperBall rounds and the streaming twin lean on: merge is an
  * idempotent commutative monoid (so ANY shuffle order, duplicate-arc
  * multiplicity, or micro-batch split produces the same registers), and
  * the zs/zeros reductions match an independent BigInt model. */
object HllBlobPropertySpec extends Properties("hllblob") {

  private val genRho: Gen[Byte] = Gen.choose(0, 61).map(_.toByte)
  private val genBlob: Gen[Array[Byte]] =
    Gen.containerOfN[Array, Byte](HllBlob.Registers, genRho)

  private def merged(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllBlob.mergeInto(a.clone(), b)

  property("merge == elementwise max (model)") =
    Prop.forAll(genBlob, genBlob) { (a, b) =>
      merged(a, b).toSeq == a.zip(b).map { case (x, y) => x max y }.toSeq
    }

  property("merge is commutative") =
    Prop.forAll(genBlob, genBlob) { (a, b) =>
      merged(a, b).toSeq == merged(b, a).toSeq
    }

  property("merge is associative") =
    Prop.forAll(genBlob, genBlob, genBlob) { (a, b, c) =>
      merged(merged(a, b), c).toSeq == merged(a, merged(b, c)).toSeq
    }

  property("merge is idempotent; empty blob is the identity") =
    Prop.forAll(genBlob) { a =>
      merged(a, a).toSeq == a.toSeq &&
        merged(a, new Array[Byte](HllBlob.Registers)).toSeq == a.toSeq
    }

  property("zs equals the BigInt indicator model; zeros counts zero bytes") =
    Prop.forAll(genBlob) { a =>
      val model = a.map(m => BigInt(1) << (61 - m)).sum
      HllBlob.zs(a).toJavaBigDecimal.toBigInteger == model.bigInteger &&
        HllBlob.zeros(a) == a.count(_ == 0)
    }

  property("seed sets exactly one register") =
    Prop.forAll(Gen.choose(0, 255), Gen.choose(1, 61)) { (bucket, rho) =>
      val s = HllBlob.seed(bucket, rho)
      s(bucket) == rho.toByte &&
        s.zipWithIndex.forall { case (v, i) => i == bucket || v == 0 }
    }
}
