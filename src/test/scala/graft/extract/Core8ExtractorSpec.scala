package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.model.EntityMention

/** Core-8 entity matrix per FIXTURES.md §4.4 — ranges, singles, edge
  * cases, conflicts, caps.
  */
class Core8ExtractorSpec extends AnyFunSuite {

  private def ents(text: String): Seq[EntityMention] = Core8Extractor.extractAll(text)
  private def ofType(text: String, t: String): Seq[String] =
    ents(text).filter(_.`type` == t).map(_.text)

  test("singles: date, money, regulation, time, phone, email, url") {
    val t = "Meeting on January 15, 2024 at 2:30 PM costs $2,500 per 29 CFR 1926.95. " +
      "Call (555) 123-4567 or email safety@example.com or visit https://osha.gov/rules."
    assert(ofType(t, "DATE") === Seq("January 15, 2024"))
    assert(ofType(t, "TIME") === Seq("2:30 PM"))
    assert(ofType(t, "MONEY") === Seq("$2,500"))
    assert(ofType(t, "REGULATION") === Seq("29 CFR 1926.95"))
    assert(ofType(t, "PHONE") === Seq("(555) 123-4567"))
    assert(ofType(t, "EMAIL") === Seq("safety@example.com"))
    assert(ofType(t, "URL") === Seq("https://osha.gov/rules."))
  }

  test("ranges_simple: 30-37 inches is ONE measurement, not two") {
    val t = "Handrail height must be 30-37 inches above the surface."
    assert(ofType(t, "MEASUREMENT") === Seq("30-37 inches"))
  }

  test("ranges_full_context: date range with both endpoint dates") {
    val t = "Project timeline: January 1, 2024 to December 31, 2024."
    assert(ofType(t, "DATE") === Seq("January 1, 2024", "December 31, 2024"))
  }

  test("edge: leap day parses; 01/02/03 ambiguity resolves as a date, not a time") {
    val t = "Recorded on February 29, 2024 and again on 01/02/03."
    assert(ofType(t, "DATE") === Seq("February 29, 2024", "01/02/03"))
    assert(ofType(t, "TIME") === Seq.empty)
  }

  test("edge: parenthetical converted unit (1.8 meters) dropped, 6 feet kept") {
    val t = "The ladder extends 6 feet (1.8 meters) above the landing."
    assert(ofType(t, "MEASUREMENT") === Seq("6 feet"))
  }

  test("conflict: August inside 'August 15-20, 2024' does not surface as ORG/GPE") {
    val t = "The audit runs August 15-20, 2024 in Chicago."
    assert(ofType(t, "DATE") === Seq("August 15-20, 2024"))
    assert(ofType(t, "GPE") === Seq("Chicago"))
    assert(!ents(t).exists(e => e.text == "August" && e.`type` != "DATE"))
  }

  test("PERSON: corpus-backed names pass 0.7 confidence; blacklisted/cap-run noise rejected") {
    val t = "Dr. John Smith and Sarah Johnson approved. Safety Requirements Overview follows."
    val persons = ofType(t, "PERSON")
    assert(persons === Seq("Dr. John Smith", "Sarah Johnson"))
  }

  test("PERSON: 31+ persons capped at 30") {
    val names = (1 to 31).map(i => s"John Smith${('a' + (i % 26)).toChar}")
    // use corpus first+last names so each passes; vary last to defeat dedup
    val t = (1 to 31).map(i => s"David Miller met Jane Garcia$i.").mkString(" ")
    // fallback deterministic: 31 distinct corpus-name pairs
    val pairs = for {
      f <- Seq("John", "Jane", "Michael", "Sarah", "David", "Emily")
      l <- Seq("Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia")
    } yield s"$f $l"
    val text = pairs.take(31).map(p => s"$p attended the session.").mkString(" ")
    assert(ofType(text, "PERSON").length === 30)
    assert(names.nonEmpty && t.nonEmpty) // silence unused warnings
  }

  test("ORG: corpus hit + suffix-cued org; stoplist words rejected") {
    val t = "Acme Corporation partnered with Birchwood Holdings LLC. The report was filed."
    val orgs = ofType(t, "ORG")
    assert(orgs.contains("Acme Corporation"))
    assert(orgs.exists(_.startsWith("Birchwood Holdings")))
    assert(!orgs.exists(_.toLowerCase == "the report"))
  }

  test("GPE/LOC: gazetteer with subcategories") {
    val t = "Flooding along the Mississippi River affected Texas and the city of Houston."
    assert(ofType(t, "LOC") === Seq("Mississippi River"))
    assert(ofType(t, "GPE").toSet === Set("Texas", "Houston"))
    assert(Core8Extractor.gpeSubcategory("texas") === "us_state")
    assert(Core8Extractor.locSubcategory("mississippi river") === "river")
  }

  test("E1: truncation at 50KB with marker") {
    val big = "x" * 60000
    val t = Core8Extractor.truncate(big)
    assert(t.length === 50000 + Core8Extractor.TruncationMarker.length)
    assert(t.endsWith(Core8Extractor.TruncationMarker))
  }

  test("E2: markdown cleanup unwraps inline formatting") {
    val md = "# Heading\n**John Smith** visited [OSHA](https://osha.gov) on *March 5, 2024*."
    val cleaned = Core8Extractor.cleanFormatting(md)
    assert(cleaned === "Heading\nJohn Smith visited OSHA on March 5, 2024.")
  }

  test("E5: sentence splitter keeps offsets, min length 5") {
    val t = "First sentence here. Second one follows! Y? Third sentence ends."
    val ss = Core8Extractor.splitSentences(t)
    assert(ss.map(_._1) === Seq("First sentence here.", "Second one follows!", "Third sentence ends."))
    ss.foreach { case (s, off) => assert(t.substring(off, off + s.length) === s) }
  }

  test("E17: dedup longest-match-first drops overlaps and repeat values") {
    val es = Seq(
      EntityMention("OSHA", "OSHA", "ORG", 10, 14),
      EntityMention("OSHA Region 5", "OSHA Region 5", "ORG", 10, 23),
      EntityMention("osha", "osha", "ORG", 40, 44))
    // "OSHA Region 5" (longest) accepted; "OSHA" at 10-14 overlaps it -> dropped;
    // standalone "osha" at 40-44 has an unseen value and no overlap -> kept.
    val d = Core8Extractor.dedupLongestFirst(es)
    assert(d.map(_.text) === Seq("OSHA Region 5", "osha"))
    // repeat VALUE at a disjoint span is dropped (seen-value semantics):
    val es2 = es :+ EntityMention("OSHA Region 5", "OSHA Region 5", "ORG", 60, 73)
    assert(Core8Extractor.dedupLongestFirst(es2).map(_.text) === Seq("OSHA Region 5", "osha"))
  }

  test("E13: range indicators extracted and adjacency flags measurements") {
    val t = "Guardrails must be up to 42 inches tall."
    val ents = Core8Extractor.extractAll(t)
    val inds = ents.filter(_.`type` == "RANGE_INDICATOR")
    assert(inds.map(_.value) == Seq("up to"), s"indicators: $inds")
    val flagged = Core8Extractor.rangeAdjacent(ents)
    val meas = ents.find(_.`type` == "MEASUREMENT").get
    assert(flagged.contains((meas.start, meas.end)),
      s"measurement after 'up to' not flagged: $ents / $flagged")
  }

  test("C4: domain entities only on deep-domain route, filtered to target domains") {
    val text = "OSHA fall protection hazard: lockout tagout scaffold ppe osha " +
      "respirator workplace safety. NIOSH and guardrail standards apply. " +
      "Kubernetes cluster mentioned once."
    val cls = graft.classify.Classifier.classify(text)
    assert(cls.enableDeepDomainExtraction, s"confidence ${cls.primaryDomainConfidence}")
    val es = graft.classify.Classifier.extractDomainEntities(text, cls.domains.keySet)
    assert(es.contains("safety/osha") && es.contains("safety/niosh") &&
      es.contains("safety/guardrail"), s"got $es")
    // technology not among scored domains -> kubernetes filtered out
    if (!cls.domains.contains("technology")) assert(!es.exists(_.startsWith("technology/")))
    // dedup preserves first occurrence, single osha entry
    assert(es.count(_ == "safety/osha") == 1)
  }
}
