package graft

import graft.functions.TextFunctions
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the task-local text/binary kernels behind the pipeline
  * operators (winnowing, simhash, multimodal stub decode).
  */
class PipelineSpec extends AnyFunSuite {

  test("winnow: identical texts share all fingerprints; disjoint texts share none") {
    val a = TextFunctions.winnow("the quick brown fox jumps over the lazy dog", 5, 4)
    val b = TextFunctions.winnow("the quick brown fox jumps over the lazy dog", 5, 4)
    assert(a.toSeq == b.toSeq && a.nonEmpty)
    val c = TextFunctions.winnow("zzzz yyyy xxxx wwww vvvv uuuu tttt ssss", 5, 4)
    assert(a.toSet.intersect(c.toSet).isEmpty)
  }

  test("winnow: guarantee — a shared substring of length >= w+k-1 shares a fingerprint") {
    val shared = "common shared fragment of text here"
    val a = TextFunctions.winnow("prefix aaa " + shared + " tail one", 5, 4)
    val b = TextFunctions.winnow("other start " + shared + " different end", 5, 4)
    assert(a.toSet.intersect(b.toSet).nonEmpty)
  }

  test("winnow: degenerate inputs") {
    assert(TextFunctions.winnow("abc", 5, 4).isEmpty)          // shorter than k
    assert(TextFunctions.winnow("abcdef", 5, 4).length == 1)   // fewer k-grams than window
  }

  test("simhash32: permutation-invariant over token sets, sensitive to content") {
    val t1 = Seq("spark", "query", "table", "join")
    val h1 = TextFunctions.simhash32(t1)
    assert(TextFunctions.simhash32(t1.reverse) == h1)
    assert(h1 >= 0 && h1 < (1L << 32))
    val h2 = TextFunctions.simhash32(Seq("completely", "different", "words", "here"))
    assert(TextFunctions.hamming(h1, h2) > 0)
    // Near-dup token sets land at small Hamming distance vs a disjoint set.
    val h1near = TextFunctions.simhash32(t1 :+ "extra")
    assert(TextFunctions.hamming(h1, h1near) < TextFunctions.hamming(h1, h2))
  }

  test("fakeDecode: mean byte value and ceil-division frame count") {
    val bytes = Array.tabulate(130)(i => (i % 256).toByte)
    val (mean, frames) = TextFunctions.fakeDecode(bytes, frameSize = 64)
    assert(frames == 3) // ceil(130/64)
    assert(math.abs(mean - bytes.map(_ & 0xff).sum.toDouble / 130) < 1e-12)
    assert(TextFunctions.fakeDecode(Array.empty, 64) == (0.0, 0L))
  }
}
