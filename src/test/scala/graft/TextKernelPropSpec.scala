package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.HashKernels

/** Property tests pinning the single-pass text kernels to the regex
  * formulations they replaced (which are also what the DuckDB oracle
  * states) — any divergence is a parity bug before it reaches the
  * driver's compare.
  */
object TextKernelPropSpec extends Properties("TextKernels") {

  private val texty: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaLowerChar,
    2 -> Gen.numChar,
    2 -> Gen.const(' '),
    1 -> Gen.oneOf('\t', '\n', '\r', '\u000b', '\f'),
    2 -> Gen.oneOf("!?.,;:()[]{}#@$%^&*-_=+`~/\\|'\"<>".toSeq),
    1 -> Gen.alphaUpperChar,
    1 -> Gen.oneOf('é', 'ß', '中', '€'))).map(_.mkString)

  private def u(s: String) = UTF8String.fromString(s)

  property("ws_token_count == size(split(trim-spaces, \\s+))") =
    forAll(texty) { s =>
      val trimmed = {
        var lo = 0; var hi = s.length
        while (lo < hi && s.charAt(lo) == ' ') lo += 1
        while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
        s.substring(lo, hi)
      }
      // Spark's split(str, regex) is Java split with limit -1:
      // trailing empty elements are KEPT
      val ref = trimmed.split("\\s+", -1).length
      HashKernels.wsTokenCount(u(s)) == ref
    }

  property("punct_count == length - length(regexp_replace punct)") =
    forAll(texty) { s =>
      val ref = s.length - s.replaceAll("[!-/:-@\\[-`{-~]", "").length
      HashKernels.punctCount(u(s)) == ref
    }

  private val bpePattern =
    java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")

  property("bpe_token_count == len(regexp_extract_all runs pattern)") =
    forAll(texty) { s =>
      val m = bpePattern.matcher(s)
      var ref = 0
      while (m.find()) ref += 1
      HashKernels.bpeTokenCount(u(s)) == ref
    }
}
