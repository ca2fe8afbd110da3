package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 text additions: BPE merge induction and the Gopher rule filter. */
class Round4TextSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._
  import graft.functions.TextAnalysis

  test("bpeMerges reproduces the classic Sennrich worked example") {
    // the canonical BPE illustration: corpus {low x5, lower x2, newest x6,
    // widest x3} (Sennrich et al. 2016, §3.2). With (count DESC, pair ASC)
    // tie-breaks the first merges are deterministic:
    //   r1: (e,s) 9  [newest 6 + widest 3]
    //   r2: (es,t) 9
    //   r3: (l,o) 7  [low 5 + lower 2]
    //   r4: (lo,w) 7
    //   r5: (e,w) 6 — ties (n,e)/(e,w)/(w,est) at 6, 'e' sorts first
    //   r6: (ew,est) 6 — newest is now [n, ew, est]; "ew" < "n"
    val docs = Seq(
      (1L, Seq.fill(5)("low").mkString(" ")),
      (2L, Seq.fill(2)("lower").mkString(" ")),
      (3L, Seq.fill(6)("newest").mkString(" ")),
      (4L, Seq.fill(3)("widest").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(docs, "doc_id", "text", rounds = 6)
      .orderBy("round")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
    assert(out(0) == ((1, "e", "s", "es", 9L)))
    assert(out(1) == ((2, "es", "t", "est", 9L)))
    assert(out(2) == ((3, "l", "o", "lo", 7L)))
    assert(out(3) == ((4, "lo", "w", "low", 7L)))
    assert(out(4) == ((5, "e", "w", "ew", 6L)))
    assert(out(5) == ((6, "ew", "est", "ewest", 6L)))
  }

  test("bpeMerges greedy run semantics: aaaa -> aa aa, aaa -> aa a") {
    val docs = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(docs, "doc_id", "text", rounds = 2)
      .orderBy("round").collect()
    // r1: (a,a) appears 3x in aaaa + 2x in aaa = 5 adjacent pairs
    assert((out(0).getString(1), out(0).getString(2), out(0).getLong(4)) ==
      (("a", "a", 5L)))
    // after the merge, aaaa = [aa, aa] and aaa = [aa, a]:
    // pairs are (aa,aa) 1 and (aa,a) 1 -> tie broken to (aa,a)
    assert((out(1).getString(1), out(1).getString(2)) == (("aa", "a")))
  }

  test("bpeMerges stops early when no pairs remain") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    // single-char words have no adjacent pairs at all
    assert(TextAnalysis.bpeMerges(docs, "doc_id", "text", rounds = 4).count() == 0)
  }

  test("gopherRules flags each published rule independently") {
    val stopTail = "the of and that have with to be"
    val good = (Seq.fill(6)("sensible english words appear here") :+ stopTail)
      .mkString(" ") // 32 words, all alpha, 2+ stop words, no symbols
    val docs = Seq(
      (1L, good),
      (2L, "short text " + stopTail),                    // word count < 30
      (3L, good + " ##### ##### ##### #####"),           // symbol ratio
      (4L, ("123 " * 20) + good))                        // alpha fraction diluted
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text",
        minWords = 30, maxWords = 1000)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("gopher_pass"))
    assert(!out(2L).getAs[Boolean]("ok_word_count"))
    assert(!out(3L).getAs[Boolean]("ok_symbol_ratio"))
    assert(out(3L).getAs[Long]("n_symbols") == 20L)
    assert(!out(4L).getAs[Boolean]("ok_alpha"))
    assert(out(1L).getAs[Long]("n_stop_words") >= 2L)
  }

  test("gopherRules line rules: bullets and ellipsis endings") {
    val bullety = (1 to 9).map(i => s"- item $i").mkString("\n") + "\nplain"
    val dotty = "a line...\nanother...\nplain one\nlast plain"
    val docs = Seq((1L, bullety), (2L, dotty)).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text", minWords = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // 9 of 10 lines bullet-started: 10*9 < 9*10 is false -> fails
    assert(out(1L).getAs[Long]("n_bullet_lines") == 9L)
    assert(!out(1L).getAs[Boolean]("ok_bullets"))
    // 2 of 4 lines ellipsis-ended: 10*2 < 3*4 is false -> fails
    assert(out(2L).getAs[Long]("n_ellipsis_lines") == 2L)
    assert(!out(2L).getAs[Boolean]("ok_ellipses"))
  }
}
