package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.AhoCorasick

/** Pure-kernel tests for the Aho–Corasick multi-pattern matcher (the
  * engine under MultiContainsExpr / bannedTermScreen), including the
  * classic textbook fixture and a randomized equivalence sweep against
  * naive per-term contains. */
class AhoCorasickSpec extends AnyFunSuite {

  test("the Aho–Corasick 1975 fixture: ushers finds he, she, hers") {
    val ac = AhoCorasick(Seq("he", "she", "his", "hers"))
    assert(ac.distinctTerms("ushers").toSeq == Seq(0, 1, 3))
    assert(ac.distinctTerms("his house").toSeq == Seq(2))
    assert(ac.distinctTerms("a shed").toSeq == Seq(0, 1)) // she + he
    assert(ac.distinctTerms("xyz").toSeq == Seq())
  }

  test("needle inside needle: every window hit is also a dow hit") {
    val ac = AhoCorasick(Seq("window", "dow", "in"))
    assert(ac.distinctTerms("window").toSeq == Seq(0, 1, 2))
    assert(ac.distinctTerms("dowel").toSeq == Seq(1))
    assert(ac.distinctTerms("winter").toSeq == Seq(2))
  }

  test("edge cases: empty/null text, duplicate terms alias the first " +
      "ordinal, empty terms rejected") {
    val ac = AhoCorasick(Seq("ab", "ab", "b"))
    assert(ac.distinctTerms("").toSeq == Seq())
    assert(ac.distinctTerms(null).toSeq == Seq())
    // the duplicate's ordinal 1 is never reported
    assert(ac.distinctTerms("ab").toSeq == Seq(0, 2))
    intercept[IllegalArgumentException] { AhoCorasick(Seq("a", "")) }
    assert(AhoCorasick(Seq.empty).distinctTerms("anything").isEmpty)
  }

  test("randomized equivalence with naive per-term contains over a " +
      "dense 3-letter alphabet (worst case for failure links)") {
    // deterministic LCG; alphabet {a,b,c} makes overlaps/fails dense
    var seed = 12345L
    def nextInt(n: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % n).toInt + n) % n
    }
    def randStr(len: Int): String =
      (0 until len).map(_ => ('a' + nextInt(3)).toChar).mkString
    for (round <- 1 to 50) {
      val terms = (0 until 3 + nextInt(6)).map(_ => randStr(1 + nextInt(4)))
        .distinct
      val ac = AhoCorasick(terms)
      for (_ <- 1 to 10) {
        val text = randStr(nextInt(60))
        val expect = terms.zipWithIndex
          .filter { case (t, _) => text.contains(t) }.map(_._2)
        assert(ac.distinctTerms(text).toSeq == expect,
          s"round=$round terms=$terms text=$text")
      }
    }
  }
}
