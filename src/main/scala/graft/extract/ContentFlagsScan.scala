package graft.extract

import graft.model.{ContentFlags, Span, SpanKinds => K}

/** F17: 10-boolean content quick scan (`service_processor.py:1660-1698`)
  * — single pass over the emitted spans (the reference scans its markdown
  * lines; spans are our markdown blocks).
  */
object ContentFlagsScan {

  private val citationRx = java.util.regex.Pattern.compile(
    "\\(\\d{4}\\)|\\bet al\\.|\\[\\d+\\]")
  private val footnoteRx = java.util.regex.Pattern.compile(
    "\\[\\^\\d+\\]|(?m)^\\s*\\d+\\.\\s+(?:see|cf\\.|ibid)", java.util.regex.Pattern.CASE_INSENSITIVE)
  private val kvRx = java.util.regex.Pattern.compile("(?m)^[A-Za-z ]{2,30}:\\s+\\S")

  def scan(spans: Seq[Span]): ContentFlags = {
    var tables, images, formulas, code, links, lists, headers, footnotes, citations = false
    var kvLines = 0
    spans.foreach { s =>
      s.kind match {
        case K.Table => tables = true
        case K.ImageRef => images = true
        case K.Formula => formulas = true
        case K.Code => code = true
        case K.ListItem => lists = true
        case K.Heading => headers = true
        case _ => ()
      }
      val t = s.text
      if (!links && (t.contains("](http") || t.contains("http://") || t.contains("https://")))
        links = true
      if (!citations && citationRx.matcher(t).find()) citations = true
      if (!footnotes && footnoteRx.matcher(t).find()) footnotes = true
      val kv = kvRx.matcher(t)
      while (kv.find()) kvLines += 1
    }
    val structured = tables || kvLines >= 3
    ContentFlags(tables, images, formulas, code, links, lists, headers,
      footnotes, citations, structured)
  }
}
