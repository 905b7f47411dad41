package graft.sources

import graft.model.{Span, SpanKinds}

/** CSV → text conversion (SURVEY.md §2.2 F12, reference
  * `mvp-hyper/core/mvp-hyper-core.py:444-478`): rows joined with
  * `' | '`, header kept as the first line — the reference's low-fidelity
  * tabular path, emitted as a single table span. RFC-4180-lite field
  * parsing (quoted fields, embedded commas, doubled quotes).
  */
object CsvText {

  def parseLine(line: String): Seq[String] = {
    val fields = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur += '"'; i += 1 }
          else inQuotes = false
        } else cur += c
      } else c match {
        case '"' => inQuotes = true
        case ',' => fields += cur.toString; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    fields += cur.toString
    fields.result()
  }

  /** Whole-document conversion: each row's fields joined with ' | '. */
  def toText(csv: String): String =
    csv.linesIterator
      .filter(_.nonEmpty)
      .map(l => parseLine(l).map(_.trim).mkString(" | "))
      .mkString("\n")

  /** Span emission for the pipeline: one table span (matches the
    * reference emitting the converted rows as a single text block).
    */
  def extract(csv: String): Seq[Span] = {
    val text = toText(csv)
    if (text.isEmpty) Seq.empty
    else Seq(Span(SpanKinds.Table, text, "", 0))
  }
}
