package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** Replicates the reference's own committed golden output for the
  * example.com conversion (`mvp-fusion/example.com.md`, produced by its
  * URL pipeline): main content = h1 heading, body paragraph, and the
  * IANA link as a markdown link — with head/style noise stripped. The
  * reference golden's stray "htmlExample Domain" first line is an
  * html2text artifact of the <title> tag, which our boilerplate strip
  * intentionally drops (title is metadata, not main content).
  */
class ReferenceGoldenSpec extends AnyFunSuite {

  // the canonical, publicly-stable example.com page structure
  private val html =
    """<!doctype html>
      |<html>
      |<head>
      |    <title>Example Domain</title>
      |    <meta charset="utf-8" />
      |    <meta http-equiv="Content-type" content="text/html; charset=utf-8" />
      |    <meta name="viewport" content="width=device-width, initial-scale=1" />
      |    <style type="text/css">
      |    body { background-color: #f0f0f2; margin: 0; padding: 0; }
      |    div { width: 600px; margin: 5em auto; padding: 2em; }
      |    </style>
      |</head>
      |<body>
      |<div>
      |    <h1>Example Domain</h1>
      |    <p>This domain is for use in illustrative examples in documents. You may use this
      |    domain in literature without prior coordination or asking for permission.</p>
      |    <p><a href="https://www.iana.org/domains/example">More information...</a></p>
      |</div>
      |</body>
      |</html>""".stripMargin

  test("example.com main content matches the reference golden (mvp-fusion/example.com.md)") {
    val spans = HtmlExtractor.extract(html)
    assert(spans.nonEmpty)
    val heading = spans.find(_.kind == "heading").get
    assert(heading.text == "# Example Domain")
    val texts = spans.filter(_.kind == "text").map(_.text)
    assert(texts.exists(_.startsWith(
      "This domain is for use in illustrative examples in documents.")),
      s"paragraph missing: $texts")
    assert(texts.exists(_.contains("without prior coordination or asking for permission.")))
    assert(spans.exists(_.text.contains(
      "[More information...](https://www.iana.org/domains/example)")),
      s"link not rendered as markdown: ${spans.map(_.text)}")
    // style/head noise never leaks into spans
    assert(!spans.exists(_.text.contains("background-color")))
    assert(!spans.exists(_.text.contains("viewport")))
  }
}
