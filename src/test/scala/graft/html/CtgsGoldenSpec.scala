package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** Replicates the reference's committed URL-pipeline golden for the
  * ctgs.com landing page (`mvp-fusion/ctgs.com.md`): deep heading
  * ladder (h1/h2/h5), absolute-src images as standalone image refs,
  * src-less (lazy-loaded) images as `[Image: alt]` text, `[More](url)`
  * links in paragraph flow. The reference golden's leaked
  * "Google tag (gtag.js)" / "[Skip to content]" first line is an
  * html2text artifact — our boilerplate strip drops script bodies and
  * nav links by design (same stance as ReferenceGoldenSpec's title).
  */
class CtgsGoldenSpec extends AnyFunSuite {

  private val html =
    """<html><head><title>CTGS – CTGS</title>
      |<script>/* Google tag (gtag.js) */ var g=1;</script></head>
      |<body>
      |<nav><a href="https://ctgs.com#content">Skip to content</a></nav>
      |<main>
      |<h1>Crafting Bespoke Solutions to Propel Your Success</h1>
      |<h5>A Legacy of Innovation Growth Hacking Managed Innovation</h5>
      |<img src="https://ctgs.com/wp-content/uploads/2024/04/office.webp" alt="">
      |<h2>Tailored Playbooks for Every Client</h2>
      |<p>Each client is unique, and we work closely with you to create customized
      |playbook that align perfectly with your goals, governance, and growth.<a
      |href="https://ctgs.com/2024/05/01/tailored-playbooks-for-every-client/">More</a></p>
      |<img alt="Staples">
      |<p>Embarking on an adventure to revolutionize e-commerce, we navigated
      |through the unknown.</p>
      |</main>
      |<footer><a href="/privacy">Privacy</a></footer>
      |</body></html>""".stripMargin

  test("ctgs.com page structure matches the reference golden shapes") {
    val spans = HtmlExtractor.extract(html, baseUrl = "https://ctgs.com")
    val byKind = spans.groupBy(_.kind)

    // heading ladder with levels preserved
    val headings = byKind.getOrElse("heading", Seq.empty).map(_.text)
    assert(headings.contains("# Crafting Bespoke Solutions to Propel Your Success"))
    assert(headings.contains("##### A Legacy of Innovation Growth Hacking Managed Innovation"))
    assert(headings.contains("## Tailored Playbooks for Every Client"))

    // absolute-src image -> standalone image_ref with the full URL
    val imgs = byKind.getOrElse("image_ref", Seq.empty)
    assert(imgs.exists(_.media_ref == "https://ctgs.com/wp-content/uploads/2024/04/office.webp"))

    // src-less lazy image renders as the reference's [Image: alt] text
    assert(spans.exists(s => s.kind == "text" && s.text == "[Image: Staples]"))

    // links stay inline as markdown inside the paragraph (reference:
    // "...governance, and growth.[More](https://ctgs.com/2024/05/01/...)")
    assert(spans.exists(_.text.endsWith(
      "governance, and growth.[More](https://ctgs.com/2024/05/01/tailored-playbooks-for-every-client/)")))

    // script body and nav boilerplate never leak
    assert(!spans.exists(_.text.contains("gtag")))
    assert(!spans.exists(_.text.contains("Skip to content")))
  }
}
