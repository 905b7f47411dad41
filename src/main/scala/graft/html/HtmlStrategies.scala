package graft.html

import graft.model.{Span, SpanKinds => K}

/** F11: configurable HTML conversion strategy — the reference's
  * converter factory (`utils/configurable_markdown_converter.py:36-120`
  * selects html2text / beautifulsoup / markdownify per config;
  * `config/config.yaml:122-128`) re-expressed as named strategies over
  * our own implementations:
  *
  *  - `dom` (default): the high-fidelity path — from-scratch tokenizer,
  *    boilerplate classifier, markdown emitter (F8/F9)
  *  - `fast_strip` (F10): the reference's cheap regex path
  *    (`mvp-hyper/core/mvp-hyper-core.py:407-442`): delete script/style
  *    blocks, strip every tag, collapse whitespace — one text span, no
  *    structure. ~an order of magnitude cheaper per doc; the trade is
  *    exactly the reference's (speed over structure)
  *
  * Strategy choice is data-parallel config: the pipeline resolves the
  * name once per run and the chosen function runs inside the fused
  * `mapPartitions` — no per-row dispatch cost.
  */
object HtmlStrategies {

  val Dom = "dom"
  val FastStrip = "fast_strip"

  private val scriptRx = java.util.regex.Pattern.compile(
    "<script[^>]*>.*?</script>",
    java.util.regex.Pattern.DOTALL | java.util.regex.Pattern.CASE_INSENSITIVE)
  private val styleRx = java.util.regex.Pattern.compile(
    "<style[^>]*>.*?</style>",
    java.util.regex.Pattern.DOTALL | java.util.regex.Pattern.CASE_INSENSITIVE)
  private val tagRx = java.util.regex.Pattern.compile("<[^>]+>")

  /** F10 fast-strip (`mvp-hyper-core.py:411-420` semantics): the result
    * is a single unstructured text span (page_count 1 in the reference).
    */
  def fastStrip(html: String): Seq[Span] = {
    var t = scriptRx.matcher(html).replaceAll("")
    t = styleRx.matcher(t).replaceAll("")
    t = tagRx.matcher(t).replaceAll("")
    t = Entities.unescape(t).replaceAll("\\s+", " ").trim
    if (t.isEmpty) Seq.empty else Seq(Span(K.Text, t, "", 0))
  }

  /** Resolve a strategy name to its conversion function. Unknown names
    * fall back to the high-fidelity default (the reference's factory
    * falls back to its default converter the same way).
    */
  def convert(strategy: String, html: String, baseUrl: String = ""): Seq[Span] =
    strategy match {
      case FastStrip => fastStrip(html)
      case _ => HtmlExtractor.extract(html, baseUrl)
    }
}
