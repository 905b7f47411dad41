package graft.facts

import org.scalatest.funsuite.AnyFunSuite

/** X2 typed-fact breadth (`semantic_fact_extractor.py:59-168`) shipped
  * as X3 config rows: the typedPatterns set adds ContactInfo, EventFact,
  * CausalFact and PersonFact coverage over the same SPO engine, and is
  * a strict superset of the builtin semantics.
  */
class TypedFactsSpec extends AnyFunSuite {

  private val typed = SpoExtractor.typedPatterns

  test("ContactInfo: Contact <Name> at <phone> -> (name, HAS_PHONE, phone)") {
    val t = "Contact Sarah Johnson at (555) 212-4433 regarding the audit."
    val f = SpoExtractor.extract(t, typed).filter(_.fact_type == "contact_info")
    assert(f.map(x => (x.subject, x.predicate, x.`object`)) ===
      Seq(("Sarah Johnson", "HAS_PHONE", "(555) 212-4433")))
    assert(f.head.confidence === 0.92) // 0.82 + two multi-word bonuses
    assert(!f.head.actionable)
  }

  test("EventFact: <event> is scheduled for <date> -> SCHEDULED_FOR") {
    val t = "The inspection is scheduled for June 5, 2023 at 4:30 PM in Chicago."
    val f = SpoExtractor.extract(t, typed).filter(_.fact_type == "event")
    assert(f.map(x => (x.subject, x.predicate, x.`object`)) ===
      Seq(("The inspection", "SCHEDULED_FOR", "June 5, 2023")))
    assert(f.head.confidence === 0.9)
    assert(f.head.actionable)
  }

  test("CausalFact: cause carries effect, clause stops at subordinate 'under'") {
    val t = "Violations carry a penalty of $12,500 under 29 CFR 1926.142."
    val facts = SpoExtractor.extract(t, typed)
    val f = facts.filter(_.fact_type == "causal")
    assert(f.map(x => (x.subject, x.predicate, x.`object`)) ===
      Seq(("Violations", "RESULTS_IN", "a penalty of $12,500")))
    assert(f.head.confidence === 0.83)
    // the overlapping builtin financial_impact fact survives alongside:
    // dedup kills overlaps only within a fact type
    assert(facts.exists(_.fact_type == "financial_impact"))
    assert(facts.exists(_.fact_type == "regulation_citation"))
  }

  test("PersonFact: <Title> <Name> of <the Org> -> AFFILIATED_WITH") {
    val t = "President Wexford of the Department of Harborview visited Pinecrest Valley."
    val f = SpoExtractor.extract(t, typed).filter(_.fact_type == "person_fact")
    assert(f.map(x => (x.subject, x.predicate, x.`object`)) ===
      Seq(("Wexford", "AFFILIATED_WITH", "the Department of Harborview")))
    assert(f.head.confidence === 0.85)
  }

  test("typed set is a strict superset: builtin facts unchanged, new types additive") {
    val t = "Contact Jane Brown at (555) 101-2020 today. " +
      "Guardrails must measure 30-37 inches and reports shall be filed within 14 days."
    val base = SpoExtractor.extract(t)
    val ext = SpoExtractor.extract(t, typed)
    assert(base.forall(b => ext.exists(e =>
      e.fact_type == b.fact_type && e.subject == b.subject && e.`object` == b.`object`)))
    // contact_info on the first sentence, measurement_requirement (r5)
    // on the second — and nothing else typed
    assert(ext.filter(f => SpoExtractor.typedFactTypes.contains(f.fact_type))
      .map(_.fact_type).sorted === Seq("contact_info", "measurement_requirement"))
    assert(base.forall(f => !SpoExtractor.typedFactTypes.contains(f.fact_type)))
  }
}
