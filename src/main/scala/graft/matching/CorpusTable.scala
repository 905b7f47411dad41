package graft.matching

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Production corpus loading — the path the reference takes through
  * `utils/core8_corpus_loader.py:66-247` (foundation-data files →
  * in-memory sets shared across workers), restated Spark-first:
  *
  *   corpus table (kind, value, meta) → driver collect → CorpusBundle
  *   → `sparkContext.broadcast` → per-executor `Corpora.install`
  *
  * The collect here IS the broadcast pattern: gazetteers are dimension
  * data (a few hundred MB at the reference's 429K/99K scale — far under
  * executor memory), and one broadcast beats re-reading the table in
  * every task. ExtractionPipeline installs the shipped bundle at
  * partition start, so automatons compile once per executor JVM per
  * corpus version.
  *
  * Row kinds: first_name | last_name | gpe | loc | org. `meta` carries
  * the GPE/LOC subcategory (country/us_state/city/agency/river/...).
  */
object CorpusTable {

  val Kinds: Set[String] = Set("first_name", "last_name", "gpe", "loc", "org")

  /** Build a bundle from corpus rows. `version` must change whenever the
    * table contents change (pass a snapshot id / content hash).
    */
  def fromRows(version: String, rows: Seq[(String, String, String)]): CorpusBundle = {
    val byKind = rows.groupBy(_._1)
    def values(kind: String): Seq[(String, String)] =
      byKind.getOrElse(kind, Seq.empty).map(r => (r._2.toLowerCase, r._3))
    CorpusBundle(
      version = version,
      firstNames = values("first_name").map(_._1).toSet,
      lastNames = values("last_name").map(_._1).toSet,
      gpe = values("gpe").toMap,
      loc = values("loc").toMap,
      orgs = values("org").map(_._1).toSet)
  }

  /** Load a corpus table (columns kind, value, meta) into a bundle. */
  def load(spark: SparkSession, table: DataFrame, version: String): CorpusBundle = {
    val rows = table.select("kind", "value", "meta").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)).getOrElse("")))
    fromRows(version, rows.toIndexedSeq)
  }

  /** Load with a SNAPSHOT-HASH version: md5 over the sorted row triples,
    * so two loads of identical content share one version (and therefore
    * one compiled automaton generation per executor JVM), while any
    * table edit rolls the version and evicts the old automatons.
    */
  def loadVersioned(spark: SparkSession, table: DataFrame): CorpusBundle = {
    val rows = table.select("kind", "value", "meta").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)).getOrElse("")))
      .toIndexedSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.sorted.foreach { case (k, v, m) =>
      md.update(s"$k|$v|$m\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val version = "snap-" + md.digest().map("%02x".format(_)).mkString.take(16)
    fromRows(version, rows)
  }

  /** Ship a bundle to every executor: broadcast once; the returned hook
    * is called inside mapPartitions (idempotent per JVM per version).
    */
  def broadcastInstaller(spark: SparkSession, bundle: CorpusBundle): () => Unit = {
    val bc = spark.sparkContext.broadcast(bundle)
    () => Corpora.install(bc.value)
  }
}

/** Deterministic broadened gazetteer synthesis — stands in for the
  * reference's full 429K/99K foundation files (not shippable here):
  * the built-in real-name seed crossed with common surname/given-name
  * morphology plus a second tier of public-knowledge names. Every row
  * is a pure function of the seed lists, so two builds of the table are
  * identical. Scale purpose: exercise automaton build + broadcast at
  * tens of thousands of patterns, not to claim linguistic coverage.
  */
object CorpusGen {

  /** Additional real given names beyond the built-in seed (public
    * top-name lists; international coverage).
    */
  private val extraFirstNames: Seq[String] = Seq(
    "liam", "oliver", "elijah", "lucas", "mason", "logan", "sebastian",
    "jackson", "aiden", "owen", "gabriel", "julian", "wyatt", "leo",
    "luke", "isaac", "dylan", "caleb", "nathaniel", "hunter", "isabella",
    "sophia", "mia", "charlotte", "amelia", "harper", "abigail", "luna",
    "ella", "chloe", "penelope", "layla", "riley", "zoey", "nora",
    "lily", "eleanor", "hazel", "violet", "aurora", "stella", "natalie",
    "leah", "sofia", "mateo", "diego", "luis", "miguel", "alejandro",
    "sofia", "valentina", "camila", "lucia", "elena", "marco", "giulia",
    "francesca", "lorenzo", "matteo", "hans", "klaus", "greta", "fritz",
    "henrik", "astrid", "freya", "bjorn", "sven", "anika", "katarzyna",
    "pawel", "zofia", "andrei", "dmitri", "natasha", "svetlana", "yusuf",
    "fatima", "omar", "layla", "hassan", "amir", "mei", "jun", "hana",
    "kenji", "sakura", "takeshi", "minjun", "jiwoo", "arjun", "ananya",
    "rohan", "divya", "sanjay", "meera", "kwame", "amara", "chidi", "zara")

  /** Additional real family names (public top-surname lists). */
  private val extraLastNames: Seq[String] = Seq(
    "oconnor", "obrien", "osullivan", "mccarthy", "mcdonald", "macleod",
    "fitzgerald", "kowalski", "nowak", "wisniewski", "kowalczyk",
    "petrov", "volkov", "sokolov", "novak", "horvat", "kovacs", "nagy",
    "rossi", "russo", "ferrari", "esposito", "bianchi", "romano",
    "schmidt", "schneider", "fischer", "weber", "meyer", "wagner",
    "becker", "schulz", "hoffmann", "koch", "bauer", "richter",
    "andersson", "johansson", "karlsson", "nilsson", "eriksson",
    "larsen", "hansen", "jensen", "pedersen", "dubois", "moreau",
    "laurent", "lefebvre", "bernard", "fontaine", "silva", "santos",
    "oliveira", "souza", "pereira", "ferreira", "yamamoto", "watanabe",
    "takahashi", "kobayashi", "nakamura", "saito", "liu", "yang",
    "huang", "zhao", "wu", "zhou", "xu", "sun", "ma", "zhu", "park",
    "choi", "jung", "kang", "sharma", "gupta", "mehta", "reddy",
    "iyer", "joshi", "malhotra", "chowdhury", "rahman", "hussain",
    "ali", "khan", "ahmed", "ibrahim", "okafor", "mensah", "diallo",
    "traore", "abebe", "tesfaye")

  /** Morphology-derived surname tier: seed surnames crossed with common
    * formation patterns (patronymic -son/-sen swaps, Mc/O' prefixes,
    * -berg/-stein/-ford/-wood compounds). Synthetic fill for automaton
    * scale testing — deterministic, clearly tiered via meta="derived".
    */
  def derivedLastNames(seed: Seq[String]): Seq[String] = {
    val bases = seed.filter(n => n.length >= 3 && n.length <= 9)
    val out = Seq.newBuilder[String]
    bases.foreach { b =>
      if (b.endsWith("son")) out += (b.dropRight(3) + "sen")
      else if (b.endsWith("sen")) out += (b.dropRight(3) + "son")
      else {
        out += (b + "son")
        out += ("mc" + b)
      }
      out += (b + "berg")
      out += (b + "ford")
    }
    out.result().distinct
  }

  /** The full deterministic corpus table rows: built-ins + extra real
    * tier + derived tier.
    */
  def rows: Seq[(String, String, String)] = {
    val b = Corpora.builtIn
    val seedLast = b.lastNames.toSeq.sorted
    (b.firstNames.toSeq.sorted.map(("first_name", _, "seed")) ++
      extraFirstNames.distinct.map(("first_name", _, "public")) ++
      seedLast.map(("last_name", _, "seed")) ++
      extraLastNames.distinct.map(("last_name", _, "public")) ++
      derivedLastNames(seedLast ++ extraLastNames).map(("last_name", _, "derived")) ++
      b.gpe.toSeq.sorted.map { case (v, m) => ("gpe", v, m) } ++
      b.loc.toSeq.sorted.map { case (v, m) => ("loc", v, m) } ++
      b.orgs.toSeq.sorted.map(("org", _, "seed"))).distinct
  }

  /** A larger derived surname tier reaching `target` patterns: base
    * names crossed with common prefix/suffix morphology, then base-pair
    * compounds until the target is met. Deterministic (sorted bases,
    * fixed iteration order); meta tier "derived2". Purpose: drive the
    * automaton/broadcast path at the reference's 10^5-name scale — the
    * 429K foundation files then differ only in the DATA, not the code.
    */
  def derivedTierAt(target: Int): Seq[String] = {
    val b = Corpora.builtIn
    val bases = (b.lastNames.toSeq ++ extraLastNames ++ extraFirstNames)
      .filter(n => n.length >= 3 && n.length <= 9).distinct.sorted
    val prefixes = Seq("", "mc", "o", "fitz", "van", "von", "de", "la")
    val suffixes = Seq("son", "sen", "berg", "stein", "ford", "wood",
      "field", "man", "dale", "worth", "ton", "ley", "more", "well", "brook", "shaw")
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    val it1 = for (p <- prefixes.iterator; s <- suffixes.iterator; n <- bases.iterator)
      yield p + n + s
    it1.takeWhile(_ => out.size < target).foreach(out += _)
    if (out.size < target) {
      val it2 = for (a <- bases.iterator; c <- bases.iterator if a != c)
        yield a + c
      it2.takeWhile(_ => out.size < target).foreach(out += _)
    }
    // third tier for the reference's full 429K scale: base-pair
    // compounds crossed with the suffix morphology (capacity ~10^6).
    // Ordered AFTER it1/it2 so every smaller tier is a prefix of a
    // larger one — rowsAt(100000) is unchanged by this extension.
    if (out.size < target) {
      val it3 = for (s <- suffixes.iterator; a <- bases.iterator;
          c <- bases.iterator if a != c)
        yield a + c + s
      it3.takeWhile(_ => out.size < target).foreach(out += _)
    }
    out.toSeq
  }

  /** rows + the scaled derived tier (~`targetDerived` extra surnames). */
  def rowsAt(targetDerived: Int): Seq[(String, String, String)] =
    (rows ++ derivedTierAt(targetDerived).map(("last_name", _, "derived2"))).distinct
}
