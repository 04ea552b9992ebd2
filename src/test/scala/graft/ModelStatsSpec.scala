package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
import graft.functions.HashKernels

/** The fused T15 feature kernel vs its five standalone kernels —
  * every integer must be BIT-identical (the modelQualityScore
  * arithmetic consumes them unchanged, so this differential is what
  * keeps every hash-checked score consumer stable).
  */
class ModelStatsSpec extends AnyFunSuite {

  private def fused(t: String): Seq[Long] =
    HashKernels.modelStats(u8(t)).toLongArray().toSeq

  private def standalone(t: String): Seq[Long] = Seq(
    HashKernels.wsTokenCount(u8(t)).toLong,
    HashKernels.stopwordHits(u8(t), "en").toLong,
    HashKernels.punctCount(u8(t)).toLong,
    HashKernels.topTokenCount(u8(t)),
    HashKernels.shingleKeys(u8(t), u8(""), 2).numElements().toLong)

  test("hand-picked edges match the five standalone kernels") {
    val cases = Seq(
      "", " ", "\t", "  \t  ", "solo", "a b", "the the the",
      "a b a b a", "x! y? z.", "  lead and trail  ",
      "tab\tsep\nnewline\rmix", "the a of and to in is",
      "dup dup dup uniq", "p.u,n;c:t!", "héllo wörld héllo",
      "a  b   c", " \t a \t ")
    cases.foreach { c =>
      assert(fused(c) == standalone(c), s"case '$c'")
    }
  }

  test("random docs match the five standalone kernels") {
    val rnd = new scala.util.Random(20260814L)
    val vocab = Seq("the", "a", "of", "zz", "w1", "w2", "x!", "..",
      "tok", "tok", "y,y")
    val seps = Seq(" ", "  ", "\t", "\n", " \t ")
    for (it <- 1 to 300) {
      val n = rnd.nextInt(30)
      val parts = Seq.fill(n)(vocab(rnd.nextInt(vocab.length)))
      val doc = {
        val sb = new StringBuilder
        if (rnd.nextBoolean()) sb.append(seps(rnd.nextInt(seps.length)))
        parts.zipWithIndex.foreach { case (p, i) =>
          if (i > 0) sb.append(seps(rnd.nextInt(seps.length)))
          sb.append(p)
        }
        if (rnd.nextBoolean()) sb.append(seps(rnd.nextInt(seps.length)))
        sb.toString
      }
      assert(fused(doc) == standalone(doc), s"iter $it doc='$doc'")
    }
  }
}
