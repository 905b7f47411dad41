package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{PdfBlock, Span, SpanKinds => K}

/** Multi-column PDF reading-order cases per FIXTURES.md §4.3 (R1-R6)
  * and the interleaved image case §4.2 (I3).
  */
class PdfExtractorSpec extends AnyFunSuite {

  private def blk(page: Int, x0: Double, y0: Double, x1: Double, y1: Double,
                  text: String, img: Boolean = false, ref: String = ""): PdfBlock =
    PdfBlock(page, x0, y0, x1, y1, text, img, ref)

  private def textsOf(r: Either[String, Seq[Span]]): Seq[String] =
    r.toOption.get.map(_.text)

  test("R1: single column, shuffled input order -> (y,x) sorted") {
    val blocks = Seq(
      blk(1, 50, 500, 550, 540, "third paragraph."),
      blk(1, 50, 100, 550, 140, "first paragraph."),
      blk(1, 50, 300, 550, 340, "second paragraph."))
    val r = PdfExtractor.extract("d1", blocks, 1)
    assert(textsOf(r) === Seq("# d1", "## Page 1",
      "first paragraph.", "second paragraph.", "third paragraph."))
  }

  test("R2: two columns -> left column fully before right column") {
    val blocks = Seq(
      blk(1, 300, 100, 590, 140, "right top."),
      blk(1, 0, 400, 290, 440, "left bottom."),
      blk(1, 300, 400, 590, 440, "right bottom."),
      blk(1, 0, 100, 290, 140, "left top."))
    val r = PdfExtractor.extract("d2", blocks, 1)
    assert(textsOf(r) === Seq("# d2", "## Page 1",
      "left top.", "left bottom.", "right top.", "right bottom."))
  }

  test("R3: page headers and --- separators between pages, none after last") {
    val blocks = Seq(
      blk(1, 50, 100, 550, 140, "page one text."),
      blk(2, 50, 100, 550, 140, "page two text."))
    val r = PdfExtractor.extract("d3", blocks, 2)
    val spans = r.toOption.get
    assert(spans.map(s => (s.kind, s.text)) === Seq(
      (K.Heading, "# d3"),
      (K.PageBreak, "## Page 1"),
      (K.Text, "page one text."),
      (K.PageBreak, "---"),
      (K.PageBreak, "## Page 2"),
      (K.Text, "page two text.")))
    assert(spans.map(_.offset) === (0 until 6))
  }

  test("R4: >100 page doc rejected with error, zero spans") {
    val r = PdfExtractor.extract("d4", Seq(blk(1, 0, 0, 10, 10, "x")), 101)
    assert(r.isLeft)
    assert(r.swap.toOption.get.contains("101 pages"))
  }

  test("R5: overlapping fragmented blocks merged before emission") {
    val blocks = Seq(
      blk(1, 100, 100, 300, 130, "E = mc"),
      blk(1, 100, 125, 310, 150, "2 (mass-energy)")) // overlaps vertically
    val r = PdfExtractor.extract("d5", blocks, 1)
    val texts = textsOf(r)
    assert(texts.length === 3) // title, page header, one merged block
    assert(texts(2) === "E = mc\n2 (mass-energy)")
  }

  test("R5b: nearby blocks (v-dist<30, h-overlap>0) merged") {
    val blocks = Seq(
      blk(1, 100, 100, 300, 120, "fragment one"),
      blk(1, 100, 135, 300, 155, "fragment two")) // gap 15 < 30
    val r = PdfExtractor.extract("d5b", blocks, 1)
    assert(textsOf(r).length === 3)
  }

  test("R5c: distant blocks NOT merged") {
    val blocks = Seq(
      blk(1, 100, 100, 300, 120, "para one."),
      blk(1, 100, 200, 300, 220, "para two.")) // gap 80 > 30
    val r = PdfExtractor.extract("d5c", blocks, 1)
    assert(textsOf(r) === Seq("# d5c", "## Page 1", "para one.", "para two."))
  }

  test("R6: formula block classified kind=formula; aligned numeric block kind=table") {
    val blocks = Seq(
      blk(1, 50, 100, 550, 140, "x = y + 1"),
      blk(1, 50, 300, 550, 400, "Item  Qty  Price\napple  2  3.50\npear  5  1.25"))
    val spans = PdfExtractor.extract("d6", blocks, 1).toOption.get
    assert(spans(2).kind === K.Formula)
    assert(spans(3).kind === K.Table)
  }

  test("R6b: unicode math symbols -> formula; Figure caption -> figure; title-case -> heading") {
    assert(PdfExtractor.classify("∑ x_i over all i") === K.Formula)
    assert(PdfExtractor.classify("Figure 3: throughput by worker count") === K.Figure)
    assert(PdfExtractor.classify("Safety Requirements Overview") === K.Heading)
    assert(PdfExtractor.classify("the quick brown fox jumps over the lazy dog every day.") === K.Text)
  }

  test("I3: image block between text blocks -> image_ref span in order") {
    val blocks = Seq(
      blk(1, 50, 100, 550, 140, "before image."),
      blk(1, 50, 200, 550, 400, "chart alt", img = true, ref = "img://d7/p1/0"),
      blk(1, 50, 500, 550, 540, "after image."))
    val spans = PdfExtractor.extract("d7", blocks, 1).toOption.get
    assert(spans.map(s => (s.kind, s.text, s.media_ref)) === Seq(
      (K.Heading, "# d7", ""),
      (K.PageBreak, "## Page 1", ""),
      (K.Text, "before image.", ""),
      (K.ImageRef, "chart alt", "img://d7/p1/0"),
      (K.Text, "after image.", "")))
  }
}
