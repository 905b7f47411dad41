package graft.extract

import graft.model.RawDoc
import graft.pipeline.ExtractionPipeline
import org.scalatest.funsuite.AnyFunSuite

/** F15 universal fallback: mostly-printable content passes through,
  * binary content yields its embedded strings, hopeless content yields
  * a placeholder — never a reject row.
  */
class UniversalFallbackSpec extends AnyFunSuite {

  private val nul = "\u0000"

  test("mostly-printable content passes through as one text span") {
    val content = "This is an unknown but readable log format.\nSecond line of it."
    val spans = UniversalFallback.extract("d1", content)
    assert(spans.map(_.text) === Seq(content))
  }

  test("binary-dominant content yields printable runs of length >= 4, in order") {
    // 70 NULs push the printable ratio under 0.7 so the text attempt
    // declines; "no"/"ab" are under the 4-char run minimum
    val content = nul * 70 + "Contract" + nul + "no" + nul + "Safety Plan" +
      nul + "ab" + nul + "Budget2024" + nul * 30
    val spans = UniversalFallback.extract("d1", content)
    assert(spans.map(_.text) === Seq("Contract\nSafety Plan\nBudget2024"))
  }

  test("content with no harvestable strings yields the placeholder") {
    val content = nul + "ab" + nul + "cd" + nul
    val spans = UniversalFallback.extract("doc9", content)
    assert(spans.map(_.text) === Seq("[Binary file: doc9]"))
  }

  test("string harvest respects the scan and keep caps") {
    val content = (0 until 2000).map(i => f"str$i%04d").mkString(nul)
    val spans = UniversalFallback.binaryStringsAttempt(content).get
    val lines = spans.head.text.split("\n")
    assert(lines.length === UniversalFallback.MaxStringsKept)
    assert(lines.head === "str0000")
  }

  test("pipeline routes unknown kinds through the fallback, not the reject channel") {
    val content = nul * 70 + "Inspection Notes" + nul + "version four" + nul + "xy" + nul * 20
    val raw = RawDoc("dbin", "octet", "", Seq.empty, content, content.length.toLong, 1)
    val doc = ExtractionPipeline.processDoc(raw)
    assert(doc.success, s"fallback must succeed: ${doc.error}")
    assert(doc.spans.map(_.text) === Seq("Inspection Notes\nversion four"))
  }
}
