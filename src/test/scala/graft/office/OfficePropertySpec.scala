package graft.office

import graft.model.OfficePart
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the OOXML scanner: escaping round-trips, and
  * arbitrary garbage input never throws or hangs (same stance as the
  * HTML tokenizer fuzz). Raw ScalaCheck Gens with a fixed seed — no
  * scalatestplus bridge in the offline cache.
  */
class OfficePropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(17L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 3) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced > n / 2, s"generator too sparse: $produced of $n")
  }

  private val paraText: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(' ', '&', '<', '>', '"', '.', ',', '$', '|')))
    .map(_.take(200).mkString)

  test("P-O1: docx paragraphs round-trip through escaping") {
    forAll(Gen.listOfN(5, paraText)) { paras =>
      val xml = "<w:document><w:body>" +
        paras.map(p => s"<w:p><w:r><w:t>${OfficeExtractor.escapeXml(p)}</w:t></w:r></w:p>").mkString +
        "</w:body></w:document>"
      val spans = OfficeExtractor.extractDocx(Seq(OfficePart("word/document.xml", xml)))
        .getOrElse(fail("docx extract rejected valid xml"))
      assert(spans.map(_.text) === paras.filter(_.nonEmpty))
    }
  }

  test("P-O2: garbage XML never throws; span offsets always sequential") {
    val garbage = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr, Gen.const("<w:p>"), Gen.const("</w:p>"), Gen.const("<w:t"),
      Gen.const("</w:t>"), Gen.const("<"), Gen.const(">"), Gen.const("&"),
      Gen.const("<w:t/>"), Gen.const("<row r=\""), Gen.const("<p:sp>")))
      .map(_.mkString)
    forAll(garbage) { xml =>
      for (kind <- Seq("docx", "pptx", "xlsx")) {
        val parts = Seq(
          OfficePart("word/document.xml", xml),
          OfficePart("ppt/slides/slide1.xml", xml),
          OfficePart("xl/workbook.xml", xml),
          OfficePart("xl/worksheets/sheet1.xml", xml))
        OfficeExtractor.extract(kind, parts) match {
          case Right(spans) =>
            assert(spans.zipWithIndex.forall { case (s, i) => s.offset == i })
          case Left(err) => assert(err.nonEmpty)
        }
      }
    }
  }

  test("P-O3: attribute values with entities unescape") {
    val wb = """<workbook><sheets><sheet name="A &amp; B" sheetId="1"/></sheets></workbook>"""
    assert(OfficeExtractor.attrValues(wb, "sheet", "name") === Seq("A & B"))
  }
}
