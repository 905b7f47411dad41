package graft.pdf

import graft.model.{PdfBlock, Span, SpanKinds => K}
import scala.collection.mutable.ArrayBuffer

/** PDF block-geometry pipeline (SURVEY.md §2.2 F1-F7), a Spark-first
  * re-expression of the reference's PyMuPDF-based extractors:
  *
  *  - page loop + `# doc` / `## Page N` headers / `---` separators
  *    (`extraction/highspeed_markdown_general_extractor.py:221-243`)
  *  - >100-page skip (`:167-174`)
  *  - reading-order sort = x-band (column) clustering then (y0, x0)
  *    within band — the `sort=True` semantics of
  *    `cli/fast_text_extractor.py:236` generalized to multi-column
  *    (explicit (y0,x0) sorts at `cli/extract_all_visual_elements.py:569,779`)
  *  - overlapping/nearby block merge (`cli/bounding_box_match_method.py:232-258`,
  *    v-dist<30 & h-overlap>0 at `cli/extract_all_visual_elements.py:550-615`)
  *  - math / table / figure region classification
  *    (`cli/fast_text_extractor.py:1325-1466,1486-1541`)
  *  - image placeholder spans (`cli/fast_text_extractor.py:1113-1206`)
  *
  * All functions are pure and document-local — designed to run inside a
  * single fused `mapPartitions` over `Dataset[RawDoc]`.
  */
object PdfExtractor {

  val MaxPages = 100 // reference `highspeed_markdown_general_extractor.py:167-174`

  // ---------------------------------------------------------------- merge

  private def hOverlap(a: PdfBlock, b: PdfBlock): Double =
    math.min(a.x1, b.x1) - math.max(a.x0, b.x0)
  private def vOverlap(a: PdfBlock, b: PdfBlock): Double =
    math.min(a.y1, b.y1) - math.max(a.y0, b.y0)
  private def vDistance(a: PdfBlock, b: PdfBlock): Double =
    if (vOverlap(a, b) > 0) 0.0 else math.max(a.y0, b.y0) - math.min(a.y1, b.y1)

  /** True when two text blocks should merge: bbox overlap in both axes,
    * or nearby (vertical distance < 30 with horizontal overlap > 0) —
    * the fragmented-formula fix.
    */
  def shouldMerge(a: PdfBlock, b: PdfBlock): Boolean =
    !a.is_image && !b.is_image &&
      ((hOverlap(a, b) > 0 && vOverlap(a, b) > 0) ||
       (hOverlap(a, b) > 0 && vDistance(a, b) < 30.0))

  private def merge(a: PdfBlock, b: PdfBlock): PdfBlock = {
    // text order within a merged block: (y0, x0) of the fragments
    val first = if (a.y0 < b.y0 || (a.y0 == b.y0 && a.x0 <= b.x0)) a else b
    val second = if (first eq a) b else a
    PdfBlock(a.page,
      math.min(a.x0, b.x0), math.min(a.y0, b.y0),
      math.max(a.x1, b.x1), math.max(a.y1, b.y1),
      (first.text.trim + "\n" + second.text.trim).trim,
      is_image = false, media_ref = "")
  }

  /** Iteratively union-merge overlapping/nearby text blocks on a page. */
  def mergeBlocks(blocks: Seq[PdfBlock]): Seq[PdfBlock] = {
    val work = ArrayBuffer.from(blocks)
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i < work.length && !changed) {
        var j = i + 1
        while (j < work.length && !changed) {
          if (shouldMerge(work(i), work(j))) {
            val m = merge(work(i), work(j))
            work.remove(j); work.remove(i); work.insert(i, m)
            changed = true
          }
          j += 1
        }
        i += 1
      }
    }
    work.toSeq
  }

  // -------------------------------------------------------- reading order

  /** Cluster blocks into x-bands (columns): blocks whose x-intervals
    * overlap join the same band. Bands ordered by min x0; within a band
    * blocks sort by (y0, x0). Single-column pages degrade to a plain
    * (y0, x0) sort — exactly PyMuPDF `sort=True`.
    */
  def readingOrder(blocks: Seq[PdfBlock]): Seq[PdfBlock] = {
    if (blocks.isEmpty) return blocks
    val sorted = blocks.sortBy(b => (b.x0, b.y0))
    val bands = new ArrayBuffer[ArrayBuffer[PdfBlock]]
    var curMaxX = Double.MinValue
    sorted.foreach { b =>
      if (bands.nonEmpty && b.x0 < curMaxX) {
        bands.last += b
        curMaxX = math.max(curMaxX, b.x1)
      } else {
        bands += ArrayBuffer(b)
        curMaxX = b.x1
      }
    }
    bands.flatMap(_.sortBy(b => (b.y0, b.x0))).toSeq
  }

  // --------------------------------------------------- region classifiers

  private val mathSymbols: Set[Char] =
    "∑∏∫√∂∇∆∞≈≠≤≥±×÷∈∉⊂⊃∪∩∀∃αβγδεζηθλμπσφψωΩΣΠ".toSet
  private val subSupChars: Set[Char] = "⁰¹²³⁴⁵⁶⁷⁸⁹₀₁₂₃₄₅₆₇₈₉ₓₐ".toSet
  private val mathPatterns: Seq[java.util.regex.Pattern] = Seq(
    "[a-zA-Z]\\s*=\\s*[-+]?[a-zA-Z0-9(]",          // x = y + 1
    "\\b\\w+\\s*\\^\\s*\\w+",                        // x^2
    "\\b(sin|cos|tan|log|ln|exp|sqrt|lim|sum|int)\\s*\\(", // functions
    "\\d+\\s*/\\s*\\d+\\s*[=+\\-]",                  // fractions in eqns
    "\\([a-z]\\s*[-+*/]\\s*[a-z]\\)",                // (a + b)
    "\\b[a-z]\\([a-z]\\)\\s*=",                       // f(x) =
    "\\bd[xyz]/d[xyz]\\b"                             // derivatives
  ).map(java.util.regex.Pattern.compile)

  /** Math region detection (`cli/fast_text_extractor.py:1325-1400`):
    * Unicode math symbols, equation-shaped regexes, sub/superscript
    * characters, math-character ratio > 20%.
    */
  def isFormula(text: String): Boolean = {
    val t = text.trim
    if (t.isEmpty) return false
    if (t.exists(mathSymbols.contains)) return true
    if (t.count(subSupChars.contains) >= 2) return true
    if (mathPatterns.exists(_.matcher(t).find())) return true
    val mathChars = t.count(c => "=+-*/^()<>".indexOf(c) >= 0 || Character.isDigit(c))
    val ratio = mathChars.toDouble / t.length
    ratio > 0.20 && t.contains('=') && t.length < 200
  }

  private val tableKeywords =
    Seq("total", "subtotal", "sum", "amount", "qty", "quantity", "price", "rate", "item", "no.")

  /** Table region detection (`cli/fast_text_extractor.py:1401-1485`):
    * ≥2 lines and any of — consistent pipe counts across lines; tab
    * separators; multi-space column alignment on most lines; >30%
    * numeric-dominated lines with a table keyword.
    */
  def isTable(text: String): Boolean = {
    val lines = text.split('\n').map(_.trim).filter(_.nonEmpty)
    if (lines.length < 2) return false
    val pipeCounts = lines.map(_.count(_ == '|'))
    if (pipeCounts.forall(_ >= 2) && pipeCounts.distinct.length == 1) return true
    if (lines.count(_.contains('\t')) >= lines.length / 2 && lines.exists(_.contains('\t'))) return true
    val multiSpace = lines.count(_.matches(".*\\S {2,}\\S.*"))
    if (multiSpace.toDouble / lines.length > 0.6) return true
    val numericLines = lines.count { l =>
      val digits = l.count(Character.isDigit)
      digits.toDouble / math.max(l.length, 1) > 0.3
    }
    val lower = text.toLowerCase
    numericLines.toDouble / lines.length > 0.3 && tableKeywords.exists(lower.contains)
  }

  private val figurePattern = java.util.regex.Pattern.compile(
    "(?i)^\\s*(figure|fig\\.?|chart|diagram|table)\\s+\\d+")

  /** Figure/caption detection (`cli/fast_text_extractor.py:1486-1541`). */
  def isFigureCaption(text: String): Boolean =
    figurePattern.matcher(text.trim).find()

  /** Heading heuristic: short single line, no terminal period, mostly
    * title-cased or upper-cased (mirrors the reference's header emission
    * which relies on font size — unavailable in block text, so we use
    * the same textual signals `mvp-hyper-tagger` does).
    */
  def isHeading(text: String): Boolean = {
    val t = text.trim
    if (t.isEmpty || t.length > 80 || t.contains('\n')) return false
    if (t.endsWith(".") || t.endsWith(",") || t.endsWith(";")) return false
    val words = t.split("\\s+")
    if (words.length > 12) return false
    val capd = words.count(w => w.nonEmpty && Character.isUpperCase(w.charAt(0)))
    capd.toDouble / words.length >= 0.75
  }

  def classify(text: String): String = {
    if (isFormula(text)) K.Formula
    else if (isTable(text)) K.Table
    else if (isFigureCaption(text)) K.Figure
    else if (isHeading(text)) K.Heading
    else K.Text
  }

  // --------------------------------------------------------------- emit

  /** Full document: blocks → ordered spans. Emits `# docId` title, then
    * per page: `## Page N` header, merged+ordered block spans, and a
    * `---` separator between pages (none after the last).
    * Returns Left(error) for >MaxPages docs (reject row semantics).
    */
  def extract(docId: String, blocks: Seq[PdfBlock], pageCount: Int): Either[String, Seq[Span]] = {
    if (pageCount > MaxPages)
      return Left(s"skipped: $pageCount pages exceeds $MaxPages-page limit")
    val out = new ArrayBuffer[(String, String, String)]
    out += ((K.Heading, s"# $docId", ""))
    val pages = blocks.groupBy(_.page).toSeq.sortBy(_._1)
    pages.zipWithIndex.foreach { case ((pageNo, pageBlocks), idx) =>
      out += ((K.PageBreak, s"## Page $pageNo", ""))
      val (images, texts) = pageBlocks.partition(_.is_image)
      val merged = mergeBlocks(texts)
      val ordered = readingOrder(merged ++ images)
      ordered.foreach { b =>
        if (b.is_image) out += ((K.ImageRef, b.text.trim, b.media_ref))
        else {
          val t = b.text.trim
          if (t.nonEmpty) out += ((classify(t), normalizeBlockText(t), ""))
        }
      }
      if (idx < pages.length - 1) out += ((K.PageBreak, "---", ""))
    }
    Right(out.iterator.zipWithIndex.map { case ((k, t, m), i) => Span(k, t, m, i) }.toSeq)
  }

  /** Collapse intra-line whitespace runs, preserve line structure. */
  def normalizeBlockText(s: String): String =
    s.split('\n').map(l => graft.html.MarkdownEmitter.collapseWs(l)).filter(_.nonEmpty).mkString("\n")
}
