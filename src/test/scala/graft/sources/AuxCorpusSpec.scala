package graft.sources

import graft.pipeline.ExtractionPipeline
import org.scalatest.funsuite.AnyFunSuite

/** F12/F15 aux corpus (DocGen.synthesizeAux): every synthesized doc runs
  * the full fused stage and lands in the span shape the driver oracle
  * reconstructs (see OracleSql.xCsvSpans / xFallbackSpans).
  */
class AuxCorpusSpec extends AnyFunSuite {

  private val text = "the quick brown fox jumps over a lazy dog near banks"

  test("csv docs (even ids) convert to one ' | '-joined table span") {
    val raw = DocGen.synthesizeAux(4, text)
    assert(raw.content_kind == "csv")
    val d = ExtractionPipeline.processDoc(raw)
    assert(d.success)
    assert(d.spans.length == 1)
    val s = d.spans.head
    assert(s.kind == "table")
    val lines = s.text.split("\n").toSeq
    assert(lines.head == "row_id | item | qty | note")
    assert(lines.length == 1 + 3 + 4 % 5) // header + 3 + id%5 rows
    // quoted "w1, w2" field survives as ONE field with the comma kept
    assert(lines(1).count(_ == '|') == 3)
    assert(lines(1).matches("""1 \| \w+ \| \d+ \| \w+, \w+"""))
  }

  test("fallback tier 1 (id%6==1): printable content passes through whole") {
    val raw = DocGen.synthesizeAux(1, text)
    assert(raw.content_kind == "bin")
    val d = ExtractionPipeline.processDoc(raw)
    assert(d.success)
    assert(d.spans.map(s => (s.kind, s.text)) == Seq(("text", text)))
  }

  test("fallback tier 2 (id%6==3): strings harvest keeps words of length >= 4") {
    val raw = DocGen.synthesizeAux(3, text)
    val d = ExtractionPipeline.processDoc(raw)
    val expected = text.split(" ").filter(_.length >= 4).mkString("\n")
    assert(d.spans.map(s => (s.kind, s.text)) == Seq(("text", expected)))
  }

  test("fallback tier 3 (id%6==5): pure control bytes yield the placeholder") {
    val raw = DocGen.synthesizeAux(5, text)
    val d = ExtractionPipeline.processDoc(raw)
    assert(d.spans.map(_.text) == Seq("[Binary file: doc5]"))
  }

  test("aux synthesis is deterministic") {
    (0L to 11L).foreach { id =>
      assert(DocGen.synthesizeAux(id, text) == DocGen.synthesizeAux(id, text))
    }
  }
}
