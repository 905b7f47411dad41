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
  *  - `html2text`: the reference's DEFAULT converter profile
  *    (`configurable_markdown_converter.py:66-95`: body_width=0,
  *    ignore_links=False, ignore_images=True). html2text converts the
  *    whole document — it has no content-extraction step — so this
  *    strategy emits markdown over the full DOM (nav/header/footer
  *    included), keeps `[text](url)` links, and drops image spans.
  *    Same parser and emitter as `dom`; the profile differs only in
  *    what is kept
  *
  * Strategy choice is data-parallel config: the pipeline resolves the
  * name once per run and the chosen function runs inside the fused
  * `mapPartitions` — no per-row dispatch cost.
  */
object HtmlStrategies {

  val Dom = "dom"
  val FastStrip = "fast_strip"
  val Html2Text = "html2text"

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

  /** html2text-profile conversion: full-document markdown (no
    * boilerplate classifier — html2text converts everything the parser
    * keeps), links preserved by the emitter, images dropped
    * (`ignore_images=True` is the reference's default). Span offsets
    * are re-numbered after the image filter so consumers still see a
    * dense 0..n-1 ordering.
    */
  def html2text(html: String, baseUrl: String = ""): Seq[Span] = {
    val dom = HtmlParser.parse(html)
    dropRawText(dom)
    MarkdownEmitter.emit(dom, baseUrl)
      .filter(_.kind != K.ImageRef)
      .zipWithIndex.map { case (s, i) => s.copy(offset = i) }
  }

  /** html2text never renders script/style payloads, but it has no
    * boilerplate classifier either — so prune exactly the parser's
    * raw-text elements and nothing else (nav/header/footer stay, unlike
    * `dom`).
    */
  private def dropRawText(n: HtmlParser.Node): Unit = {
    n.children.filterInPlace(ch => ch.isText || !HtmlParser.rawTextElems.contains(ch.tag))
    n.children.foreach(ch => if (!ch.isText) dropRawText(ch))
  }

  /** Resolve a strategy name to its conversion function. Unknown names
    * fall back to the high-fidelity default (the reference's factory
    * falls back to its default converter the same way).
    */
  def convert(strategy: String, html: String, baseUrl: String = ""): Seq[Span] =
    strategy match {
      case FastStrip => fastStrip(html)
      case Html2Text => html2text(html, baseUrl)
      case _ => HtmlExtractor.extract(html, baseUrl)
    }
}
