package graft.classify

import org.scalatest.funsuite.AnyFunSuite

/** C3 routing decisions pinned to `service_processor.py:1922-1927`:
  * skip_entity_extraction fires purely on primary confidence < 5.0;
  * deep-domain extraction at >= 60.0. The no-signal default
  * ("general": 100.0) never skips — matching the reference, where the
  * default path always proceeds to extraction.
  */
class RoutingSpec extends AnyFunSuite {

  test("no-signal docs default to general:100 and run extraction") {
    val c = Classifier.classify("plain words with no domain keywords whatsoever")
    assert(c.primaryDomain === "general")
    assert(c.primaryDomainConfidence === 100.0)
    assert(!c.skipEntityExtraction)
    // the reference's literal `>= 60.0` check also fires on the
    // general:100 default; C4 then finds nothing because "general" has
    // no domain-entity list — same observable outcome, pinned here
    assert(c.enableDeepDomainExtraction)
    assert(Classifier.extractDomainEntities(
      "plain words with no domain keywords whatsoever", Set("general")).isEmpty)
  }

  test("strong safety signal routes to deep-domain extraction") {
    val c = Classifier.classify(
      "OSHA workplace safety: fall protection, scaffold and guardrail hazards, " +
        "lockout tagout, PPE and respirator requirements under the hazcom standard.")
    assert(c.primaryDomain !== "general")
    assert(c.primaryDomainConfidence >= 60.0)
    assert(c.enableDeepDomainExtraction)
    assert(!c.skipEntityExtraction)
  }

  test("skip gate is pure confidence < 5.0 (percent-normalized scores keep the max above it)") {
    // percent normalization means the winning domain's score is at least
    // 100 / #domains — with the corpus's domain count the gate cannot
    // fire on real scores, exactly as in the reference's own scoring
    val c = Classifier.classify(
      "safety inspection contract budget software patient classroom environment")
    assert(c.primaryDomainConfidence >= 5.0)
    assert(!c.skipEntityExtraction)
  }
}
