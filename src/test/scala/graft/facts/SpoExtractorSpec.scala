package graft.facts

import org.scalatest.funsuite.AnyFunSuite

/** SPO fact cases per FIXTURES.md §4.6 (F1-F3). */
class SpoExtractorSpec extends AnyFunSuite {

  test("F1: modal requirement -> REQUIRED_TO, actionable, confidence >= 0.75") {
    val t = "Safety training shall be completed on or before March 1, 2024."
    val facts = SpoExtractor.extract(t)
    assert(facts.nonEmpty)
    val f = facts.head
    assert(f.subject === "Safety training")
    assert(f.predicate === "REQUIRED_TO")
    assert(f.`object`.startsWith("completed on or before"))
    assert(f.actionable)
    assert(f.confidence >= 0.75)
    assert(f.context === t)
  }

  test("F2: within 30 days -> (Time Requirement, HAS_VALUE, 30 days)") {
    val t = "Reports must be filed within 30 days of the incident."
    val facts = SpoExtractor.extract(t)
    val tr = facts.find(_.fact_type === "time_requirement")
    assert(tr.isDefined)
    assert(tr.get.subject === "Time Requirement")
    assert(tr.get.predicate === "HAS_VALUE")
    assert(tr.get.`object` === "30 days")
  }

  test("financial impact and regulation citation") {
    val t = "Violations carry a penalty of $70,000 per occurrence. " +
      "Employers act in accordance with 29 CFR 1926.95 at all times."
    val facts = SpoExtractor.extract(t)
    val fin = facts.find(_.fact_type === "financial_impact")
    assert(fin.isDefined && fin.get.`object`.contains("$70,000"))
    val reg = facts.find(_.fact_type === "regulation_citation")
    assert(reg.isDefined && reg.get.predicate === "CITES")
    assert(reg.get.`object`.replaceAll("\\s+", " ").contains("29 CFR 1926.95"))
  }

  test("low-quality fragments rejected by 0.75 threshold") {
    val t = "The must do it."
    val facts = SpoExtractor.extract(t)
    assert(!facts.exists(f => f.subject.equalsIgnoreCase("The")))
  }

  test("F3: fact summary counts by type with threshold") {
    val t = "Safety training shall be completed by March. " +
      "Reports must be filed within 30 days of review. " +
      "Supervisors are responsible for equipment checks."
    val facts = SpoExtractor.extract(t)
    val sum = SpoExtractor.summarize(facts)
    assert(sum.total_facts === facts.length)
    assert(sum.quality_threshold === 0.75)
    assert(sum.actionable_facts === facts.count(_.actionable))
    assert(sum.fact_types.values.sum === facts.length)
    assert(sum.fact_types.contains("requirement"))
  }

  test("dedup: repeated subject-predicate-object kept once") {
    val t = "Workers must wear helmets. Workers must wear helmets."
    val facts = SpoExtractor.extract(t)
    assert(facts.count(f => f.`object`.toLowerCase.contains("wear helmets")) === 1)
  }

  test("reference golden (mvp-fusion/DocTest.json): contract sentence yields REQUIRED_TO + time requirement") {
    val sentence = "The delivery of GPUs shall be completed on or before the Delivery Date, " +
      "and payment shall be made in full within 30 days of delivery."
    val facts = SpoExtractor.extract(sentence)
    val req = facts.filter(f => f.predicate == "REQUIRED_TO" && f.fact_type == "requirement")
    assert(req.nonEmpty, s"no REQUIRED_TO fact: $facts")
    assert(req.exists(_.`object`.startsWith("completed on or before")),
      s"object mismatch: ${req.map(_.`object`)}")
    assert(req.forall(_.actionable))
    assert(req.forall(_.confidence >= SpoExtractor.QualityThreshold))
    val time = facts.filter(_.fact_type == "time_requirement")
    assert(time.exists(_.`object` == "30 days"), s"time facts: $time")
    // summary shape mirrors DocTest.json semantic_summary
    val sm = SpoExtractor.summarize(facts)
    assert(sm.quality_threshold == 0.75)
    assert(sm.actionable_facts >= 2)
  }

  test("X3: the pattern table is config — swapping the set changes fact coverage") {
    val text = "The contractor must submit reports. Project Alpha supersedes Project Beta."
    // default set: modal requirement only, no 'supersedes' coverage
    val before = SpoExtractor.extract(text)
    assert(before.exists(_.predicate == "MUST"))
    assert(!before.exists(_.predicate == "SUPERSEDES"))
    // config-loaded set (the spo_pattern_loader path): ONLY a new
    // supersedes pattern, shipped as plain rows
    val custom = SpoExtractor.fromRows("custom-v1", Seq(
      ("supersedes", "(?i)\\b([A-Z][\\w ,'-]{2,60}?)\\s+supersedes\\s+([\\w ,'-]{3,160}?)(?:\\.|$|;)",
        "supersession", "SUPERSEDES", 0.8, true, 1, 2, "supersede")))
    val after = SpoExtractor.extract(text, custom)
    assert(after.exists(f => f.predicate == "SUPERSEDES" &&
      f.subject == "Project Alpha" && f.`object` == "Project Beta"), s"got $after")
    assert(!after.exists(_.predicate == "MUST"))
    // trigger wire format: clauses ';', alternatives '|'
    assert(SpoExtractor.parseTriggers("fine|penalt;$") ===
      Seq(Seq("fine", "penalt"), Seq("$")))
  }

  test("X2: the four r5 typed subclasses fire from config rows (semantic_fact_extractor.py:94-162)") {
    val text = "Guardrails must measure 34-41 inches and reports shall be filed within 30 days. " +
      "OSHA and NIOSH published workplace safety and fall protection guidance in the Federal Register. " +
      "The meeting starts at 2:30 PM in Denver. " +
      "The contractor Varnell operates in the paving sector."
    val facts = SpoExtractor.extract(text, SpoExtractor.typedPatterns)
    val byType = facts.groupBy(_.fact_type)
    val m = byType("measurement_requirement").head
    assert(m.subject == "Guardrails" && m.`object` == "34-41 inches" &&
      m.predicate == "MUST_MEASURE" && m.confidence == 0.85 && m.actionable)
    val r = byType("regulatory_authority").head
    assert(r.subject == "OSHA" && r.`object` == "workplace safety and fall protection" &&
      r.confidence == 0.9)
    val g = byType("geographic").head
    assert(g.subject == "geographic" && g.`object` == "Denver" &&
      g.predicate == "LOCATED_IN" && g.confidence == 0.8)
    val c = byType("company").head
    assert(c.subject == "Varnell" && c.`object` == "paving" &&
      c.predicate == "OPERATES_IN" && c.confidence == 0.8)
    // the overlapping builtin requirement fact survives alongside the
    // measurement fact: dedup is per fact_type
    assert(byType.contains("requirement"))
    // and the builtin-only run sees none of the typed types
    val builtin = SpoExtractor.extract(text)
    assert(!builtin.exists(f => SpoExtractor.typedFactTypes.contains(f.fact_type)))
  }

  test("X3: compiled cache keys on the rows, not the version string") {
    val text = "Project Alpha supersedes Project Beta."
    val row = ("supersedes", "(?i)\\b([A-Z][\\w ,'-]{2,60}?)\\s+supersedes\\s+([\\w ,'-]{3,160}?)(?:\\.|$|;)",
      "supersession", "SUPERSEDES", 0.8, true, 1, 2, "supersede")
    // two sets REUSING one version with different rows must each compile
    // their own patterns — the second must not be served the first's
    val a = SpoExtractor.fromRows("reused-v", Seq(row))
    assert(SpoExtractor.extract(text, a).exists(_.predicate == "SUPERSEDES"))
    val b = SpoExtractor.fromRows("reused-v", Seq(row.copy(_4 = "REPLACES")))
    val got = SpoExtractor.extract(text, b)
    assert(got.exists(_.predicate == "REPLACES") &&
      !got.exists(_.predicate == "SUPERSEDES"), s"stale cache: $got")
  }
}
