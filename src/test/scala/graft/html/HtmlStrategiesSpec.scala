package graft.html

import graft.pipeline.ExtractionPipeline
import graft.pipeline.ExtractionPipeline.PipelineConfig
import graft.sources.DocGen
import org.scalatest.funsuite.AnyFunSuite

/** F11 converter strategy + F10 fast-strip path: the config-selected
  * conversion the reference's factory provides
  * (`configurable_markdown_converter.py`; fast path
  * `mvp-hyper-core.py:407-442`).
  */
class HtmlStrategiesSpec extends AnyFunSuite {

  private val html =
    """<html><head><title>T</title><style>body{color:red}</style>
      |<script>var x = "<p>not content</p>";</script></head>
      |<body><h1>Heading</h1><p>First &amp; second.</p>
      |<ul><li>item</li></ul></body></html>""".stripMargin

  test("fast_strip: scripts/styles/tags gone, whitespace collapsed, one span") {
    val spans = HtmlStrategies.fastStrip(html)
    assert(spans.length === 1)
    assert(spans.head.kind === "text")
    // adjacent tags leave no separator — the reference's regex path
    // behaves identically (tags deleted, only existing whitespace kept)
    assert(spans.head.text === "T HeadingFirst & second. item")
  }

  test("fast_strip drops script bodies even when they contain tag-like text") {
    assert(!HtmlStrategies.fastStrip(html).head.text.contains("not content"))
    assert(!HtmlStrategies.fastStrip(html).head.text.contains("color:red"))
  }

  test("strategy dispatch: dom keeps structure, fast_strip does not, unknown falls back") {
    val dom = HtmlStrategies.convert(HtmlStrategies.Dom, html)
    assert(dom.exists(_.kind == "heading"))
    assert(dom.exists(_.kind == "list_item"))
    val fast = HtmlStrategies.convert(HtmlStrategies.FastStrip, html)
    assert(fast.forall(_.kind == "text"))
    assert(HtmlStrategies.convert("nonsense", html) === dom)
  }

  test("html2text profile: full document, links kept, images dropped, scripts ignored") {
    val page =
      """<html><head><script>var s = 1;</script></head><body>
        |<nav><a href="/x">NavLink</a></nav>
        |<h1>Heading</h1>
        |<p>See <a href="https://example.com/a">the docs</a> now.</p>
        |<p><img src="/i.png" alt="pic"> after image</p>
        |</body></html>""".stripMargin
    val spans = HtmlStrategies.html2text(page, "https://example.com")
    // no boilerplate classifier: nav content survives (unlike dom)
    assert(spans.exists(_.text.contains("NavLink")),
      s"nav dropped: ${spans.map(_.text)}")
    assert(!HtmlStrategies.convert(HtmlStrategies.Dom, page, "https://example.com")
      .exists(_.text.contains("NavLink")))
    // links render as [text](resolved url)
    assert(spans.exists(_.text.contains("[the docs](https://example.com/a)")))
    // ignore_images=True: no image_ref spans, offsets stay dense
    assert(!spans.exists(_.kind == "image_ref"))
    assert(spans.map(_.offset) === spans.indices)
    // raw-text payloads never render
    assert(!spans.exists(_.text.contains("var s")))
    // dispatch reaches the same function
    assert(HtmlStrategies.convert(HtmlStrategies.Html2Text, page, "https://example.com") === spans)
  }

  test("pipeline honors the configured strategy end-to-end") {
    val raw = DocGen.synthesize(2, "alpha beta gamma") // html-mode doc
    val domOut = ExtractionPipeline.processDoc(raw)
    assert(domOut.spans.count(_.kind == "heading") >= 1)
    val fastOut = ExtractionPipeline.processDoc(raw,
      PipelineConfig(htmlStrategy = HtmlStrategies.FastStrip))
    assert(fastOut.success)
    assert(fastOut.spans.length === 1)
    assert(fastOut.spans.head.kind === "text")
    // the cheap path still feeds every downstream stage
    assert(fastOut.entities.nonEmpty)
    // fast-strip keeps boilerplate (nav/footer text) — the documented trade
    assert(fastOut.spans.head.text.contains("Privacy"))
    assert(!domOut.spans.exists(_.text.contains("Privacy")))
  }
}
