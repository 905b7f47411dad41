package graft.normalize

import org.scalatest.funsuite.AnyFunSuite

/** Evidence-scoring unit semantics (reference
  * `entity_disambiguator.py:180-250` ported constants).
  */
class DisambiguatorSpec extends AnyFunSuite {

  test("bare mention keeps the extractor's prior") {
    val d = Disambiguator.score("PERSON", Seq(("Ada Quinn", "ada quinn wrote the memo.")))
    assert(d.decided == "PERSON")
    assert(d.personScore == 0.3 && d.orgScore == 0.1)
  }

  test("title and action cues stack to a strong person call") {
    val d = Disambiguator.score("PERSON",
      Seq(("Mr. Quinn", "quinn approved the findings.")))
    assert(d.decided == "PERSON")
    assert(d.personScore == 0.95)
  }

  test("org suffix overrides a person prior") {
    val d = Disambiguator.score("PERSON",
      Seq(("Quinn Holdings", "quinn holdings acquired the plant.")))
    assert(d.decided == "ORG")
    assert(d.orgScore == 0.95) // 0.85 suffix + 0.1 context ("acquired")
  }

  test("business context flips an unprioried acronym to ORG") {
    val d = Disambiguator.score("GPE",
      Seq(("OSHA", "osha and niosh published workplace safety guidance.")))
    assert(d.decided == "ORG")
    assert(d.personScore == 0.1 && d.orgScore == 0.2)
  }

  test("direct callers may pass unlowercased sentences — score lowercases both sides") {
    val lower = Disambiguator.score("PERSON",
      Seq(("Mr. Quinn", "quinn approved the findings.")))
    val mixed = Disambiguator.score("PERSON",
      Seq(("Mr. Quinn", "Quinn approved the findings.")))
    assert(mixed == lower)
    assert(mixed.personScore == 0.95)
  }

  test("role cue is as strong as a title (reference :228-234)") {
    val d = Disambiguator.score("ORG",
      Seq(("Quinn", "ceo quinn announced the merger plan today.")))
    // role override 0.8 + action "announced" 0.15 vs org prior 0.3 + 0.1
    // context ("merged" is not in the sentence, "announced" is person-side)
    assert(d.decided == "PERSON")
    assert(d.personScore == 0.95 && d.orgScore == 0.3)
  }

  test("appositive role cue fires: '<mention>, <role>'") {
    val d = Disambiguator.score("ORG", Seq(("Quinn", "quinn, cfo of the plant.")))
    assert(d.decided == "PERSON")
    assert(d.personScore == 0.8)
  }

  test("' inc' substring edge case overrides to org 0.9 (reference :251-254)") {
    // "Quinn Incorporated" — the suffix token is NOT in OrgSuffixes
    // ("incorporated"), so only the substring edge case catches it
    val d = Disambiguator.score("PERSON",
      Seq(("Quinn Incorporated", "quinn incorporated filed the report.")))
    assert(d.decided == "ORG")
    assert(d.orgScore == 0.9 && d.personScore == 0.3)
  }

  test("evidence cues are idempotent across mentions") {
    val d = Disambiguator.score("PERSON", Seq(
      ("Mr. Quinn", "quinn approved the budget."),
      ("Ada Quinn", "ada quinn approved the plan.")))
    assert(d.personScore == 0.95) // title max + one action boost, not two
  }
}
