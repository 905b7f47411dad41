package graft.extract

import graft.model.Span
import graft.model.SpanKinds

/** F15: universal fallback for unknown content kinds — the reference's
  * last-resort extractor chain (`mvp-hyper/core/mvp-hyper-core.py:779-969`):
  * (1) treat as text when a leading sample is mostly printable,
  * (2) else harvest printable-ASCII strings of length ≥ 4 from the raw
  * bytes (strings(1)-style), capped,
  * (3) else a `[Binary file: …]` placeholder — the chain ALWAYS
  * succeeds, so corrupt or unknown inputs yield a degraded document
  * instead of a reject row. Operates on the raw content column (this
  * engine's inputs are table rows, not filesystem paths, so the
  * metadata-only tier reduces to the placeholder).
  */
object UniversalFallback {

  val SampleSize = 1024
  val MinSampleChars = 10
  val PrintableRatioMin = 0.7
  val MinStringLen = 4
  val MaxStringsKept = 500
  val MaxStringsScanned = 1000

  def extract(docId: String, content: String): Seq[Span] =
    textAttempt(content)
      .orElse(binaryStringsAttempt(content))
      .getOrElse(Seq(Span(SpanKinds.Text, s"[Binary file: $docId]", "", 0)))

  /** Reference `_try_text_extraction`: sample the head; mostly-printable
    * content passes through whole.
    */
  private[extract] def textAttempt(content: String): Option[Seq[Span]] = {
    val sample = content.take(SampleSize)
    if (sample.trim.length < MinSampleChars) None
    else {
      val printable = sample.count(c => !Character.isISOControl(c) || Character.isWhitespace(c))
      if (printable.toDouble / sample.length < PrintableRatioMin) None
      else Some(Seq(Span(SpanKinds.Text, content, "", 0)))
    }
  }

  /** Reference `_try_binary_text_extraction`: printable-ASCII runs of
    * length ≥ 4, scan capped at 1000 runs, first 500 kept, joined by
    * newlines into one text span.
    */
  private[extract] def binaryStringsAttempt(content: String): Option[Seq[Span]] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < content.length && parts.length < MaxStringsScanned) {
      val c = content.charAt(i)
      if (c >= 32 && c <= 126) cur.append(c)
      else {
        if (cur.length >= MinStringLen) parts += cur.toString
        cur.clear()
      }
      i += 1
    }
    if (cur.length >= MinStringLen && parts.length < MaxStringsScanned) parts += cur.toString
    if (parts.isEmpty) None
    else Some(Seq(Span(SpanKinds.Text, parts.take(MaxStringsKept).mkString("\n"), "", 0)))
  }
}
