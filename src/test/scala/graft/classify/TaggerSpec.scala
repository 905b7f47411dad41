package graft.classify

import org.scalatest.funsuite.AnyFunSuite

/** A5 tagger unit semantics (`mvp-hyper-tagger.py:358-462`). */
class TaggerSpec extends AnyFunSuite {

  test("keywords: stopwords and short words filtered, freq>=3 gate, (freq desc, word asc) order") {
    val content = ("widget widget widget gadget gadget gadget gadget " +
      "the the the the with with with tiny tin ") * 1
    val t = Tagger.tag(content, "general")
    // 'the'/'with' are stopwords, 'tin' too short, 'tiny' freq 1
    assert(t.keywords === Seq(("gadget", 4L), ("widget", 3L)))
  }

  test("keywords: top-15 cap with deterministic tiebreak") {
    val words = ('a' to 't').map(c => s"word$c")
    val content = words.map(w => s"$w $w $w").mkString(" ")
    val t = Tagger.tag(content, "general")
    assert(t.keywords.size == Tagger.MaxKeywords)
    assert(t.keywords.map(_._1) === words.take(15).map(_.toString))
  }

  test("topics: domain list filtered by word-substring, fallback when none") {
    val safety = Tagger.tag("workplace incidents and risk levels rise", "safety")
    // 'workplace' (workplace safety), 'incident' via 'incidents'
    // (incident reporting), 'risk' (risk assessment)
    assert(safety.topics === Seq("workplace safety", "incident reporting", "risk assessment"))
    val fallback = Tagger.tag("this compliance report covers the analysis", "medical")
    assert(fallback.topics === Seq("compliance", "reporting", "analysis"))
    val safetyNoHit = Tagger.tag("nothing relevant here", "safety")
    assert(safetyNoHit.topics.isEmpty)
  }

  test("technical score: density formula, capped at 1.0, round-half-even") {
    // 9 ws words; 1 technical term (database), 1 code term (return),
    // 2 numbers, 5 specials -> (1+2)/9*10 + 2/9*5 + 5/9*2 = 5.56 -> 1.0
    val hot = Tagger.tag("database return 12 34 (x) = {y} a b", "general")
    assert(hot.technical_score == 1.0)
    // 20 words, no tech/code/numbers/specials -> 0.0
    val cold = Tagger.tag(Seq.fill(20)("plain").mkString(" "), "general")
    assert(cold.technical_score == 0.0)
    assert(cold.word_count == 20L && cold.unique_terms == 1L)
    assert(Tagger.tag("", "general").technical_score == 0.0)
  }

  test("word_count and unique_terms are whitespace-token stats of the lowercased content") {
    val t = Tagger.tag("Alpha alpha BETA beta gamma", "general")
    assert(t.word_count == 5L)
    assert(t.unique_terms == 3L)
  }
}
