package graft.output

import graft.model._
import org.scalatest.funsuite.AnyFunSuite

class AssemblySpec extends AnyFunSuite {

  private val doc = ExtractedDoc(
    doc_id = "doc42",
    spans = Seq(
      Span(SpanKinds.Heading, "# Title", "", 0),
      Span(SpanKinds.Text, "Hello world.", "", 1),
      Span(SpanKinds.ImageRef, "fig 1", "https://x/1.png", 2),
      Span(SpanKinds.ListItem, "- item one", "", 3),
      Span(SpanKinds.Code, "x = 1", "", 4)),
    meta = DocMeta(
      DocMeta.emptyFlags.copy(has_images = true, has_lists = true, has_code = true),
      page_count = 2,
      primary_domain = "safety",
      primary_domain_confidence = 62.5,
      primary_document_type = "report",
      domains = Map("safety" -> 62.5, "general" -> 37.5)),
    entities = Seq(EntityMention("$500", "$500", "MONEY", 10, 14)),
    canonical_entities = Seq(CanonicalEntity("m001", "MONEY", "500 USD",
      Seq("$500"), 1, Seq(Mention("$500", 10, 14)))),
    facts = Seq(Fact("Employers", "shall file", "reports", 0.8,
      "requirement", "Employers shall file reports.", 0, 28, actionable = true)),
    success = true, error = "")

  test("O1: markdown assembly is deterministic with YAML frontmatter") {
    val md = Assembly.assembleMarkdown(doc)
    assert(md.startsWith("---\nconversion:\n  engine: graft-spark-1.0\n  doc_id: doc42\n"))
    assert(md.contains("  domains: {safety: 62.5, general: 37.5}\n"))
    assert(md.contains("has_images: true"))
    assert(md.contains("  has_financial_data: true\n"))
    assert(md.contains("# Title\n\nHello world.\n\n![fig 1](https://x/1.png)\n\n- item one\n```\nx = 1\n```"))
    // span text carries its own markdown prefix — never re-prefixed
    // byte-determinism: same input, same bytes
    assert(md == Assembly.assembleMarkdown(doc))
  }

  test("O2: knowledge JSON has stable shape and parses") {
    val json = Assembly.knowledgeJson(doc)
    assert(json.startsWith("""{"source_info":{"doc_id":"doc42","engine":"graft-spark-1.0","success":true}"""))
    assert(json.contains(""""semantic_summary":{"total_facts":1,"actionable_facts":1,"fact_types":{"requirement":1}}"""))
    assert(json.contains(""""canonical_entities":[{"id":"m001","type":"MONEY","normalized":"500 USD","count":1}]"""))
    assert(json.contains(""""span":{"start":0,"end":28}"""))
    // escaping: control chars and quotes survive a JSON round-trip shape
    val tricky = doc.copy(facts = Seq(doc.facts.head.copy(subject = "a\"b\nc\t")))
    assert(Assembly.knowledgeJson(tricky).contains("""a\"b\nc\t"""))
  }

  test("O1b: blockquote and page break render per markdown rules") {
    // blockquote span text already carries "> " (emitter contract); the
    // page-break span text is the header or separator — verbatim
    val d2 = doc.copy(spans = Seq(
      Span(SpanKinds.Blockquote, "> quoted line", "", 0),
      Span(SpanKinds.PageBreak, "## Page 2", "", 1),
      Span(SpanKinds.PageBreak, "---", "", 2),
      Span(SpanKinds.Text, "after", "", 3)))
    val body = Assembly.markdownBody(d2.spans)
    assert(body == "> quoted line\n\n## Page 2\n\n---\n\nafter\n")
  }
}
