package graft

import graft.engine.{HashEmbedder, SifEmbedder}
import org.scalatest.funsuite.AnyFunSuite

class SifEmbedderSpec extends AnyFunSuite {

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    dot / (na * nb)
  }

  test("frequent-token down-weighting raises similarity on informative overlap") {
    // "the" is 50% of the corpus; "quark" and "gluon" are rare. A stopword-
    // padded doc should match the informative query better under SIF than
    // under plain mean pooling.
    val freq = Map("the" -> 0.5, "quark" -> 0.001, "gluon" -> 0.001)
    val sif = new SifEmbedder(64, 0.001, freq)
    val plain = new HashEmbedder(64)
    val doc = "the the the the quark gluon"
    val query = "quark gluon"
    assert(cos(sif.embed(doc), sif.embed(query)) >
      cos(plain.embed(doc), plain.embed(query)) + 0.1)
  }

  test("unknown tokens get full weight; weight 1 on all tokens == HashEmbedder") {
    val sif = new SifEmbedder(64, 0.5, Map.empty) // every token misses -> w=1
    val plain = new HashEmbedder(64)
    val t = "alpha beta gamma alpha"
    assert(sif.embed(t).toSeq === plain.embed(t).toSeq)
  }

  test("embedding is deterministic and unit-norm") {
    val sif = new SifEmbedder(64, 0.01, Map("a" -> 0.3, "b" -> 0.01))
    val e1 = sif.embed("a b c a")
    val e2 = sif.embed("a b c a")
    assert(e1.toSeq === e2.toSeq)
    val n = math.sqrt(e1.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-6)
  }
}
