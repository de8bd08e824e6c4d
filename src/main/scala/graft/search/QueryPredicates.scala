package graft.search

import graft.analysis.Analyzers
import graft.dsl._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Stats-free compilation of a DSL query to a boolean match Column.
  *
  * Scoring needs the index's global term statistics, but pure
  * match/filter semantics do not — which makes this compiler usable
  * where no index exists yet, in particular on STREAMING DataFrames
  * (filter a document stream by a standing query; Structured
  * Streaming cannot consult a batch-built SearchIndex mid-stream).
  *
  * Tokenization uses the same analyzer pipeline as index builds, so a
  * stream filtered by `predicate(q)` admits exactly the documents the
  * batch index would match.
  */
object QueryPredicates {

  /** Match predicate over raw (un-tokenized) text/keyword columns. */
  def predicate(q: SearchQuery, analyzerName: String = "default",
      textFields: Set[String] = Set("text")): Column = {
    val an = Analyzers(analyzerName)
    def tf(field: String, term: String): Column =
      if (textFields(field))
        size(filter(an.tokensCol(col(field)), t => t === lit(term)))
      else when(col(field) === lit(term), 1).otherwise(0)
    def compile(q: SearchQuery): Column = q match {
      case AllDocs => lit(true)
      case And(l, r) => compile(l) && compile(r)
      case Or(l, r) => compile(l) || compile(r)
      case Not(inner) => !compile(inner)
      case Should(_) => lit(true)
      case MatchTerm(f, t) => tf(f, t) > 0
      case MatchText(f, t) => compile(MatchAnyTerms(f, an.analyze(t)))
      case MatchAllText(f, t) => compile(MatchAllTerms(f, an.analyze(t)))
      case MatchPhrase(f, t, slop) =>
        val terms = an.analyze(t)
        if (terms.isEmpty) lit(false)
        else {
          // positional check via the same sliding-window semantics as
          // the indexed path's phrase_count (no registry dependency)
          val toks = an.tokensCol(col(f))
          val m = terms.size
          // Docs shorter than the phrase can't match — and must not
          // reach the window: sequence(1, size-m+1) yields [1,0] when
          // the doc is short, and element_at(toks, 0) throws.
          val hit =
            if (slop == 0) {
              // window test over ZIPPED SHIFTED COPIES of the token
              // array, not element_at(toks, i + o) positions: `toks`
              // is an inline tokenizer expression, and a lambda that
              // references it is re-evaluated per element, so the
              // positional form re-tokenizes the document n*m times
              // per row (the ShingleStrings hazard). Zipping
              // references the array m+2 times TOTAL. The slice to
              // the first size-m+1 windows drops arrays_zip's
              // null-padded tails, so the predicate is never NULL for
              // docs long enough to reach it (Not() relies on that).
              val zipped = arrays_zip(
                terms.indices.map(o =>
                  (if (o == 0) toks
                   else slice(toks, lit(o + 1), greatest(size(toks) - o, lit(0))))
                    .as(s"t$o")): _*)
              exists(
                slice(zipped, lit(1), size(toks) - (m - 1)),
                s => terms.zipWithIndex
                  .map { case (term, o) => s.getField(s"t$o") === lit(term) }
                  .reduceLeft(_ && _))
            }
            else if (slop == 1) {
              // sloppy ordered: nested exists, term t at a position in
              // (prev, start + t + slop] — existential choice equals
              // phrase_count's greedy-minimal-span check (at slop <= 1
              // Lucene transpositions are impossible, so ordered is
              // exact). Bounds live in the predicate (sequence(a, b)
              // DESCENDS when a > b, so computed ranges are unsafe).
              // O(n^m) per row worst case — fine for a standing
              // stream filter.
              def rest(start: Column, prev: Column, t: Int): Column =
                if (t == m) lit(true)
                else exists(sequence(lit(1), size(toks)), j =>
                  j > prev && j <= start + lit(t + slop) &&
                    element_at(toks, j) === lit(terms(t)) && rest(start, j, t + 1))
              exists(
                sequence(lit(1), size(toks) - (m - 1)),
                i => element_at(toks, i) === lit(terms.head) && rest(i, i, 1))
            }
            else {
              // slop >= 2: Lucene sloppy-phrase (SloppyPhraseScorer)
              // semantics, mirroring PhraseCount.computeSloppy — an
              // INJECTIVE assignment of query terms to token
              // positions with adjusted-position span
              // max(p_t - t) - min(p_t - t) <= slop, which admits
              // out-of-order terms ("b a" matches "a b"~2). The span
              // check runs at every step (it is monotone in the
              // chosen set, so stepwise == final). O(n^m) per row
              // worst case, same budget as the ordered branch.
              def assign(prev: List[Column], t: Int): Column =
                if (t == m) lit(true)
                else exists(sequence(lit(1), size(toks)), q =>
                  element_at(toks, q) === lit(terms(t)) && {
                    val distinct = prev.map(p => q =!= p)
                      .reduceOption(_ && _).getOrElse(lit(true))
                    val adjs = (prev :+ q).zipWithIndex
                      .map { case (p, k) => p - lit(k) }
                    val spanOk =
                      if (adjs.size < 2) lit(true)
                      else greatest(adjs: _*) - least(adjs: _*) <= slop
                    distinct && spanOk && assign(prev :+ q, t + 1)
                  })
              assign(Nil, 0)
            }
          when(size(toks) >= m, hit).otherwise(lit(false))
        }
      case MatchNear(f, a, b, dist) =>
        // same match set as the indexed near_count path (pair with
        // |i - j| <= dist exists, either order, i < j when a == b) —
        // expressed registry-free; the indexed path's noMatch on
        // non-text fields carries over. Bounds are pre-clamped so no
        // computed sequence() can descend; the empty-array guard
        // keeps element_at away from index 0.
        if (!textFields(f)) lit(false)
        else {
          val toks = an.tokensCol(col(f))
          val hit = exists(sequence(lit(1), size(toks)), i =>
            element_at(toks, i) === lit(a) &&
              exists(sequence(greatest(i - dist, lit(1)),
                  least(i + dist, size(toks))), j =>
                element_at(toks, j) === lit(b) &&
                  (if (a == b) j > i else lit(true))))
          when(size(toks) > 0, hit).otherwise(lit(false))
        }
      case MatchAllTerms(f, ts) =>
        if (ts.isEmpty) lit(true) else ts.map(t => tf(f, t) > 0).reduceLeft(_ && _)
      case MatchAnyTerms(f, ts) =>
        if (ts.isEmpty) lit(false) else ts.map(t => tf(f, t) > 0).reduceLeft(_ || _)
      // synonym group: scoring differs from Any (SynonymQuery pseudo-
      // term), the match set does not — any variant present matches
      case MatchSynonyms(f, ts) =>
        if (ts.isEmpty) lit(false) else ts.map(t => tf(f, t) > 0).reduceLeft(_ || _)
      case MatchMin(f, min, ts) =>
        ts.map(t => when(tf(f, t) > 0, 1).otherwise(0)).reduceLeft(_ + _) >= min
      case Parsed(f, s) => compile(Parsed.desugar(f, s))
      case Boost(inner, _) => compile(inner) // boost moves score only, never the match set
      // dis-max and constant-score change SCORING only: the match
      // set is the disjunction resp. the inner query's
      case DisMax(qs, _) =>
        if (qs.isEmpty) lit(false) else qs.map(compile).reduceLeft(_ || _)
      case ConstScore(inner, _) => compile(inner)
      case FunctionScore(inner, _, _) => compile(inner)
      case Demote(pos, _, _) => compile(pos) // demotion scales score only
      // No dictionary exists here, so multi-term queries match the
      // pattern per token instead of via expansion — same match set
      // as the indexed path (expansion is over exactly these tokens),
      // acceptable per-row cost for a standing stream filter.
      case MatchWildcard(f, pat) =>
        val sql = pat.flatMap {
          case '*' => "%"; case '?' => "_"
          case '%' => "\\%"; case '_' => "\\_"; case '\\' => "\\\\"
          case c => c.toString
        }
        if (textFields(f)) exists(an.tokensCol(col(f)), t => t.like(sql))
        else col(f).like(sql)
      case MatchFuzzy(f, t, maxEdits) =>
        if (textFields(f))
          exists(an.tokensCol(col(f)), tok => levenshtein(tok, lit(t)) <= maxEdits)
        else levenshtein(col(f), lit(t)) <= maxEdits
      case MatchRegex(f, pat) =>
        // whole-term match in the Lucene RegExp dialect, translated
        // exactly as the indexed path does
        val re = "^(?:" + LuceneRegex.translate(pat) + ")$"
        if (textFields(f)) exists(an.tokensCol(col(f)), tok => tok.rlike(re))
        else col(f).rlike(re)
      case EqFilter(f, v) => col(f) === lit(v)
      case GtFilter(f, v) => col(f) > lit(v)
      case GeFilter(f, v) => col(f) >= lit(v)
      case LtFilter(f, v) => col(f) < lit(v)
      case LeFilter(f, v) => col(f) <= lit(v)
      case RangeFilter(f, lo, hi) => col(f).between(lit(lo), lit(hi))
      case InSetFilter(f, vs) => col(f).isin(vs: _*)
      case ExistsFilter(f) => col(f).isNotNull
      case MissingFilter(f) => col(f).isNull
    }
    compile(q)
  }
}
