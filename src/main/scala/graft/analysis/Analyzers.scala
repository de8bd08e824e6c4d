package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analyzer registry.
  *
  * Mirrors the reference's pluggable `ConfigurableAnalyzer` components
  * (reference: analyzers/DefaultAnalyzer.scala, EnglishAnalyzer.scala,
  * ItalianAnalyzer.scala, EnglishWikipediaAnalyzer.scala:10-13,
  * ItalianWikipediaAnalyzer.scala:10-13) re-expressed as Spark Column
  * pipelines: each analyzer maps a string Column to an
  * `array<string>` token Column built from codegen-friendly
  * `functions._` ops (lower/regexp_replace/split/filter) plus a JVM
  * UDF only for the stemming stages, which are inherently procedural.
  *
  * The reference configures index-time and query-time analyzers
  * separately (LuceneConfig.scala:20-52); [[graft.search.IndexSpec]]
  * keeps the same split. Query-time analysis reuses the same
  * [[Analyzer.analyze]] on driver-side strings so query terms agree
  * with indexed terms.
  */
trait Analyzer extends Serializable {
  def name: String

  /** Column form: string column → array<string> tokens (used at index
    * build over the corpus — distributed, no driver involvement). */
  def tokensCol(c: Column): Column

  /** Driver/executor-side form for analyzing query text; must produce
    * exactly the same tokens as [[tokensCol]]. */
  def analyze(text: String): Seq[String]
}

object Analyzers {

  /** Lucene's classic default English stop set (public domain list). */
  val EnglishStopwords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  /** Common Italian stopword subset (articles, prepositions, forms of
    * essere/avere — standard public list). */
  val ItalianStopwords: Set[String] = Set(
    "a", "ad", "al", "allo", "ai", "agli", "alla", "alle", "con", "col",
    "coi", "da", "dal", "dallo", "dai", "dagli", "dalla", "dalle", "di",
    "del", "dello", "dei", "degli", "della", "delle", "in", "nel",
    "nello", "nei", "negli", "nella", "nelle", "su", "sul", "sullo",
    "sui", "sugli", "sulla", "sulle", "per", "tra", "fra", "e", "ed",
    "o", "od", "il", "lo", "la", "i", "gli", "le", "un", "uno", "una",
    "che", "chi", "cui", "non", "come", "dove", "quando", "perche", "si",
    "e'", "sono", "era", "ha", "ho", "hanno")

  /** Italian elision prefixes stripped before tokens ("l'acqua" → "acqua"),
    * mirroring Lucene's ElisionFilter article set
    * (reference: LuceneItalianWikipediaAnalyzer.java:33-118). */
  private val ItalianElisions = Seq(
    "c", "l", "all", "dall", "dell", "nell", "sull", "coll", "pell",
    "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t", "s", "v", "d")

  private val splitPattern = "[^a-z0-9]+"

  /** Shared base tokenization: lowercase, split on non-alphanumeric,
    * drop empties. Chosen so a DuckDB oracle can reproduce it exactly:
    * `list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'), x -> x <> '')`. */
  private def baseTokens(c: Column): Column =
    filter(split(lower(c), splitPattern), t => t =!= "")

  private def baseAnalyze(text: String): Seq[String] =
    text.toLowerCase.split(splitPattern).toSeq.filter(_.nonEmpty)

  /** Strips MediaWiki markup before tokenization — the behavioral core
    * of the reference's WikipediaTokenizer stage. */
  private def stripWiki(s: String): String = s
    .replaceAll("\\{\\{[^{}]*\\}\\}", " ") // templates
    .replaceAll("<[^>]+>", " ") // html tags
    .replaceAll("\\[\\[(?:[^\\]|]*\\|)?([^\\]]*)\\]\\]", "$1") // links keep label
    .replaceAll("(?m)^[=]+|[=]+$", " ") // headings
    .replaceAll("'{2,}", " ") // bold/italic quotes

  private def stripWikiCol(c: Column): Column = {
    var x = regexp_replace(c, "\\{\\{[^{}]*\\}\\}", " ")
    x = regexp_replace(x, "<[^>]+>", " ")
    x = regexp_replace(x, "\\[\\[(?:[^\\]|]*\\|)?([^\\]]*)\\]\\]", "$1")
    x = regexp_replace(x, "(?m)^[=]+|[=]+$", " ")
    regexp_replace(x, "'{2,}", " ")
  }

  private def italianLightStem(t: String): String = {
    // light stemming: drop final vowel(s) of plural/gender suffixes
    // for words longer than 5 chars
    if (t.length <= 5) t
    else if (t.endsWith("ie") || t.endsWith("he")) t.dropRight(2)
    else if ("aeio".contains(t.last)) t.dropRight(1)
    else t
  }

  /** SimpleAnalyzer analog: lowercase + split non-alphanumeric. */
  object default extends Analyzer {
    val name = "default"
    def tokensCol(c: Column): Column = baseTokens(c)
    def analyze(text: String): Seq[String] = baseAnalyze(text)
  }

  /** Whitespace-only splitting, no lowercasing of semantics lost. */
  object whitespace extends Analyzer {
    val name = "whitespace"
    def tokensCol(c: Column): Column = filter(split(c, "\\s+"), t => t =!= "")
    def analyze(text: String): Seq[String] = text.split("\\s+").toSeq.filter(_.nonEmpty)
  }

  /** Per-token Italian pipeline step: elision strip → stopword filter
    * → light stem; None drops the token. Shared between the Column
    * expression ([[graft.functions.StemTokens]]) and [[italian.analyze]]. */
  def italianPerToken(t0: String): Option[String] = {
    val t = ItalianElisions.collectFirst {
      case e if t0.startsWith(e + "'") => t0.drop(e.length + 1)
    }.getOrElse(t0)
    if (ItalianStopwords.contains(t)) None
    else {
      val s = italianLightStem(t)
      if (s.nonEmpty) Some(s) else None
    }
  }

  /** English: base + stopwords + Porter stemming. */
  object english extends Analyzer {
    val name = "english"
    def tokensCol(c: Column): Column =
      graft.functions.StemTokens(baseTokens(c), "en")
    def analyze(text: String): Seq[String] =
      baseAnalyze(text).filterNot(EnglishStopwords).map(PorterStemmer.stem)
  }

  /** Italian: base + elision + stopwords + light stemming. */
  object italian extends Analyzer {
    val name = "italian"
    def tokensCol(c: Column): Column =
      graft.functions.StemTokens(
        filter(split(lower(c), "[^a-z0-9']+"), t => t =!= ""), "it")
    def analyze(text: String): Seq[String] =
      text.toLowerCase.split("[^a-z0-9']+").toSeq.filter(_.nonEmpty)
        .flatMap(italianPerToken)
  }

  /** English Wikipedia: markup strip + english pipeline
    * (reference: EnglishWikipediaAnalyzer.scala:10-13 — WikipediaTokenizer
    * → possessive → lowercase → stop → PorterStem). */
  object englishWikipedia extends Analyzer {
    val name = "english_wikipedia"
    // possessive filter: drop 's before tokenizing (Lucene
    // EnglishPossessiveFilter analog)
    private def stripPoss(c: Column): Column = regexp_replace(c, "'[sS]\\b", "")
    def tokensCol(c: Column): Column =
      graft.functions.StemTokens(baseTokens(stripPoss(stripWikiCol(c))), "en")
    def analyze(text: String): Seq[String] =
      baseAnalyze(stripWiki(text).replaceAll("'[sS]\\b", ""))
        .filterNot(EnglishStopwords).map(PorterStemmer.stem)
  }

  /** Italian Wikipedia: markup strip + italian pipeline
    * (reference: ItalianWikipediaAnalyzer.scala:10-13). */
  object italianWikipedia extends Analyzer {
    val name = "italian_wikipedia"
    def tokensCol(c: Column): Column = italian.tokensCol(stripWikiCol(c))
    def analyze(text: String): Seq[String] = italian.analyze(stripWiki(text))
  }

  val registry: Map[String, Analyzer] = Seq(
    default, whitespace, english, italian, englishWikipedia, italianWikipedia)
    .map(a => a.name -> a).toMap

  def apply(name: String): Analyzer = registry.getOrElse(name,
    throw new IllegalArgumentException(
      s"unknown analyzer '$name'; known: ${registry.keys.mkString(", ")}"))
}
