package graft.sources

import graft.model.RawDoc
import graft.pipeline.ExtractionPipeline
import org.scalatest.funsuite.AnyFunSuite

class CsvTextSpec extends AnyFunSuite {

  test("F12: rows joined with ' | ', quoted fields with commas survive") {
    val csv = "name,qty,note\nbolt,12,\"big, shiny\"\nnut,7,\"said \"\"ok\"\"\""
    assert(CsvText.toText(csv) ==
      "name | qty | note\nbolt | 12 | big, shiny\nnut | 7 | said \"ok\"")
  }

  test("F12: empty csv yields no spans; pipeline accepts content_kind=csv") {
    assert(CsvText.extract("").isEmpty)
    val doc = RawDoc("c1", "csv", "", Seq.empty, "a,b\n1,2", 7L, 1)
    val out = ExtractionPipeline.processDoc(doc)
    assert(out.success)
    assert(out.spans.map(_.kind) == Seq("table"))
    assert(out.spans.head.text == "a | b\n1 | 2")
  }
}
