package graft.pipeline

import graft.model.RawDoc
import graft.output.Assembly
import org.scalatest.funsuite.AnyFunSuite

/** S5 URL validation gate (`fusion_cli.py:272-280` validate_url + the
  * 10MB streamed-download cap at `:335-432`): message text and check
  * order match the reference; file-sourced docs bypass the gate.
  */
class UrlGateSpec extends AnyFunSuite {

  private def urlDoc(status: Int = 200, size: Long = 1000,
      ct: String = "text/html; charset=utf-8"): RawDoc =
    RawDoc("u1", "html", "<html><body><p>hello world</p></body></html>",
      Seq.empty, "", size, 1,
      source_url = "https://docs.example.com/u1.html",
      http_status = status, content_type = ct)

  test("non-200 responses reject with the reference message") {
    assert(ExtractionPipeline.validateUrl(urlDoc(status = 404)) ===
      Some("HTTP 404 - not processable"))
    assert(ExtractionPipeline.validateUrl(urlDoc(status = 500)) ===
      Some("HTTP 500 - not processable"))
  }

  test("empty content and non-whitelisted content types reject") {
    assert(ExtractionPipeline.validateUrl(urlDoc(size = 0)) ===
      Some("Empty content received"))
    assert(ExtractionPipeline.validateUrl(urlDoc(ct = "application/octet-stream")) ===
      Some("Unsupported content type: application/octet-stream"))
    // whitelist is substring-based: html/text/pdf/json all pass
    for (ok <- Seq("text/html", "text/plain", "application/pdf", "application/json; v=1"))
      assert(ExtractionPipeline.validateUrl(urlDoc(ct = ok)) === None, ok)
    // empty content-type is permissive (reference: `if content_type and ...`)
    assert(ExtractionPipeline.validateUrl(urlDoc(ct = "")) === None)
  }

  test("oversize downloads reject at the 10MB cap; file docs bypass the gate") {
    assert(ExtractionPipeline.validateUrl(urlDoc(size = 11L * 1024 * 1024)) ===
      Some("Content exceeds 10MB limit"))
    val fileDoc = urlDoc(status = 404).copy(source_url = "")
    assert(ExtractionPipeline.validateUrl(fileDoc) === None)
  }

  test("rejected URL docs carry url metadata into the frontmatter") {
    val out = ExtractionPipeline.processDoc(urlDoc(status = 404))
    assert(!out.success)
    assert(out.spans.isEmpty)
    assert(out.meta.source_type === "url")
    assert(out.meta.http_status === 404)
    val md = Assembly.assembleMarkdown(out)
    assert(md.contains("source_type: url"))
    assert(md.contains("source_path: https://docs.example.com/u1.html"))
    assert(md.contains("http_status: 404"))
    assert(md.contains("validation_success: false"))
    assert(md.contains("error: HTTP 404 - not processable"))
  }

  test("successful URL docs extract normally and record the url lineage") {
    val out = ExtractionPipeline.processDoc(urlDoc())
    assert(out.success)
    assert(out.spans.nonEmpty)
    assert(out.meta.source_type === "url")
    assert(out.meta.http_status === 200)
    val md = Assembly.assembleMarkdown(out)
    assert(md.contains("proceed_to_classification: true"))
  }
}
