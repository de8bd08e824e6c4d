package graft.dsl

import scala.collection.mutable

import graft.analysis.Analyzers

/** Serialized form of a [[SearchQuery]] AST: a pre-order int-array
  * "bytecode" whose leaves reference slots in aligned side tables, so
  * a DATA-DRIVEN query (one AST per row, reference
  * `queryGenerator: T => DslQuery`, SearchableRDD.scala:257-298) can
  * travel through a Spark plan as ordinary array columns and be
  * evaluated per (query, candidate-doc) pair by one codegen'd
  * expression ([[graft.functions.DslQueryScore]]) — the distributed
  * generalization of the flat-role encoding `queryJoinBool` uses.
  *
  * Layout:
  *   - `ops`    — pre-order opcode stream; children follow their
  *     parent immediately (operands inline, see the `Op` constants)
  *   - `terms`  — deduplicated strings: query terms AND filter
  *     attribute names (a slot never needs both meanings at once)
  *   - `consts` — numeric literals (boost factors, filter bounds).
  *     Const operands are emitted RELATIVE; the interpreter reads
  *     them at `|terms| + idx` of its combined doubles array, whose
  *     prefix is the per-slot IDF vector joined in-plan from the
  *     index stats (alignment identical to `queryJoinBool`'s
  *     `__idfs`)
  *   - `attrFields` — every doc column referenced by a filter (for
  *     the caller to assemble the doc-side attribute map)
  *   - `probeAlts`  — candidate-generation alternatives: each is a
  *     SOUND probe set (every matching doc must contain >= 1 of its
  *     terms); the plan picks the minimum-total-df alternative per
  *     shape (the Lucene lead-with-the-rarest-clause discipline
  *     generalized to nested ASTs) and probes the postings with it.
  *     `None` means the query is TOTAL — it can match a document
  *     containing none of its terms (a top-level Not / AllDocs /
  *     Should / pure filter), so candidates must come from a full
  *     corpus pass, the honest cost of a match-all query.
  *
  * Semantics mirror the scan path (`SearchIndex.compileWith`)
  * node-for-node, including its gating discipline: ONLY leaves gate
  * their own score on their own match; combinators always sum.
  *
  * Unsupported here (use `queryJoinDsl`, which compiles per query on
  * the driver): `MatchWildcard` / `MatchFuzzy` / `MatchRegex` (their
  * Lucene multi-term rewrite expands against the term DICTIONARY at
  * compile time — a per-query driver action, not a per-row one),
  * leaves on an indexed field other than the probe field (the
  * verifier carries one token array), and filters with non-numeric
  * values.
  */
final case class QueryProgram(
    ops: Seq[Int],
    terms: Seq[String],
    consts: Seq[Double],
    attrFields: Seq[String],
    probeAlts: Option[Seq[Seq[String]]])

object QueryProgram {

  /** Opcodes. Operand layout after each code, `t`=terms slot,
    * `c`=relative consts slot:
    *   ALLDOCS; AND/OR (2 children); NOT/SHOULD (1 child);
    *   BOOST c (1 child); TERM t; ALL n t*n; ANY n t*n;
    *   MIN m n t*n; PHRASE slop n t*n; NEAR dist t t;
    *   CMP op t c (op 0 eq,1 gt,2 ge,3 lt,4 le); RANGE t c c;
    *   INSET t n c*n; EXISTS t; MISSING t; NOMATCH; TRUEZERO. */
  object Op {
    val ALLDOCS = 0; val AND = 1; val OR = 2; val NOT = 3; val SHOULD = 4
    val BOOST = 5; val TERM = 6; val ALL = 7; val ANY = 8; val MIN = 9
    val PHRASE = 10; val NEAR = 11; val CMP = 12; val RANGE = 13
    val INSET = 14; val EXISTS = 15; val MISSING = 16
    val NOMATCH = 17; val TRUEZERO = 18
  }

  /** Bound on probe alternatives kept per node — alternatives beyond
    * it are DROPPED, never merged (dropping an alternative is always
    * sound; truncating terms inside one never is). */
  val MaxAlts = 6

  /** Pre-serialization normalization: desugars [[Parsed]] nodes and
    * reorders `And` children (CHEAPEST, GATING-FIRST) so the
    * interpreter's root-AND short-circuit evaluates filters and
    * single terms before phrase scans, and subtrees that can actually
    * REJECT a candidate (anything but Should/AllDocs roots, whose
    * predicate is constant-true) before score-only ones of equal
    * cost. Bit-exact: `And` score is one two-operand sum per node
    * and IEEE addition is commutative (only re-ASSOCIATION can
    * change a float sum; child swaps never re-associate), and the
    * match predicate is a commutative conjunction. */
  private def normalize(q: SearchQuery, an: graft.analysis.Analyzer): SearchQuery = {
    def cost(x: SearchQuery): Int = x match {
      case AllDocs | _: SearchFilter => 0
      case And(l, r) => cost(l) + cost(r)
      case Or(l, r) => cost(l) + cost(r)
      case Not(i) => cost(i)
      case Should(i) => cost(i)
      case Boost(i, _) => cost(i)
      case _: MatchTerm => 1
      case MatchText(_, t) => an.analyze(t).length
      case MatchAllText(_, t) => an.analyze(t).length
      case MatchPhrase(_, t, _) => 4 + an.analyze(t).length
      case _: MatchNear => 5
      case MatchAllTerms(_, ts) => ts.length
      case MatchAnyTerms(_, ts) => ts.length
      case MatchMin(_, _, ts) => ts.length
      // expansion leaves are rejected later; Parsed is desugared here
      case _ => 8
    }
    // can this subtree's predicate ever be false? (constant-true
    // subtrees contribute score but never reject, so they sort after
    // gating siblings of the same cost)
    def canGate(x: SearchQuery): Boolean = x match {
      case AllDocs => false
      case Should(_) => false
      case Boost(i, _) => canGate(i)
      case And(l, r) => canGate(l) || canGate(r)
      case Or(l, r) => canGate(l) && canGate(r)
      case MatchAllTerms(_, ts) => ts.nonEmpty
      case MatchMin(_, m, _) => m > 0
      case _ => true
    }
    def key(x: SearchQuery): (Int, Int) = (cost(x), if (canGate(x)) 0 else 1)
    def go(x: SearchQuery): SearchQuery = x match {
      case Parsed(f, s) => go(Parsed.desugar(f, s))
      case And(l, r) =>
        val (gl, gr) = (go(l), go(r))
        if (Ordering[(Int, Int)].lt(key(gr), key(gl))) And(gr, gl) else And(gl, gr)
      case Or(l, r) => Or(go(l), go(r))
      case Not(i) => Not(go(i))
      case Should(i) => Should(go(i))
      case Boost(i, f) => Boost(go(i), f)
      case leaf => leaf
    }
    go(q)
  }

  def compile(q0: SearchQuery, field: String, queryAnalyzer: String,
      indexedFields: Set[String], textFields: Set[String]): QueryProgram = {
    val an = Analyzers(queryAnalyzer)
    val q = normalize(q0, an)
    val ops = mutable.ArrayBuffer.empty[Int]
    val terms = mutable.LinkedHashMap.empty[String, Int]
    val consts = mutable.ArrayBuffer.empty[Double]
    val attrs = mutable.LinkedHashSet.empty[String]

    def tIdx(t: String): Int = terms.getOrElseUpdate(t, terms.size)
    def cIdx(v: Double): Int = { consts += v; consts.size - 1 }
    def num(v: Any, node: String): Double = v match {
      case n: Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"queryJoinAst supports numeric filter values only; $node got " +
          s"${if (other == null) "null" else other.getClass.getSimpleName} — " +
          "route this query through queryJoinDsl")
    }
    def unsupported(what: String): Nothing = throw new IllegalArgumentException(
      s"queryJoinAst cannot distribute $what — route this query through queryJoinDsl")

    // mirrors SearchIndex.compileWith's noMatch short-circuits
    def badField(f: String): Boolean = !indexedFields.contains(f)
    def checkField(f: String, node: String): Unit =
      if (f != field)
        unsupported(s"$node on indexed field '$f' (this join verifies field '$field' only)")

    def emitTerms(code: Int, f: String, ts: Seq[String], prefix: Seq[Int]): Unit = {
      checkField(f, "a term query")
      ops += code
      ops ++= prefix
      ops += ts.length
      ts.foreach(t => ops += tIdx(t))
    }

    def emit(x: SearchQuery): Unit = x match {
      case AllDocs => ops += Op.ALLDOCS
      case And(l, r) => ops += Op.AND; emit(l); emit(r)
      case Or(l, r) => ops += Op.OR; emit(l); emit(r)
      case Not(inner) => ops += Op.NOT; emit(inner)
      case Should(inner) => ops += Op.SHOULD; emit(inner)
      case Boost(inner, f) => ops += Op.BOOST; ops += cIdx(f); emit(inner)
      case MatchTerm(f, t) =>
        if (badField(f)) ops += Op.NOMATCH
        else { checkField(f, "MatchTerm"); ops += Op.TERM; ops += tIdx(t) }
      case MatchText(f, t) =>
        if (badField(f)) ops += Op.NOMATCH
        else emit(MatchAnyTerms(f, an.analyze(t)))
      case MatchAllText(f, t) =>
        if (badField(f)) ops += Op.NOMATCH
        else emit(MatchAllTerms(f, an.analyze(t)))
      case MatchPhrase(f, t, slop) =>
        if (!textFields.contains(f)) ops += Op.NOMATCH
        else {
          val ts = an.analyze(t)
          if (ts.isEmpty) ops += Op.NOMATCH
          else emitTerms(Op.PHRASE, f, ts, Seq(slop))
        }
      case MatchNear(f, a, b, dist) =>
        if (!textFields.contains(f)) ops += Op.NOMATCH
        else {
          checkField(f, "MatchNear")
          ops += Op.NEAR; ops += dist; ops += tIdx(a); ops += tIdx(b)
        }
      case MatchAllTerms(f, ts) =>
        if (badField(f)) ops += Op.NOMATCH
        else if (ts.isEmpty) ops += Op.TRUEZERO
        else emitTerms(Op.ALL, f, ts, Nil)
      case MatchAnyTerms(f, ts) =>
        if (badField(f)) ops += Op.NOMATCH
        else if (ts.isEmpty) ops += Op.NOMATCH
        else emitTerms(Op.ANY, f, ts, Nil)
      case MatchMin(f, m, ts) =>
        if (badField(f)) ops += Op.NOMATCH
        else if (ts.isEmpty) ops += (if (m <= 0) Op.TRUEZERO else Op.NOMATCH)
        else emitTerms(Op.MIN, f, ts, Seq(m))
      case Parsed(f, s) => emit(Parsed.desugar(f, s))
      case _: MatchWildcard => unsupported("MatchWildcard (dictionary expansion)")
      case _: MatchFuzzy => unsupported("MatchFuzzy (dictionary expansion)")
      case _: MatchRegex => unsupported("MatchRegex (dictionary expansion)")
      case EqFilter(f, v) => emitCmp(0, f, v, "EqFilter")
      case GtFilter(f, v) => emitCmp(1, f, v, "GtFilter")
      case GeFilter(f, v) => emitCmp(2, f, v, "GeFilter")
      case LtFilter(f, v) => emitCmp(3, f, v, "LtFilter")
      case LeFilter(f, v) => emitCmp(4, f, v, "LeFilter")
      case RangeFilter(f, lo, hi) =>
        attrs += f
        ops += Op.RANGE; ops += tIdx(f)
        ops += cIdx(num(lo, "RangeFilter")); ops += cIdx(num(hi, "RangeFilter"))
      case InSetFilter(f, vs) =>
        attrs += f
        ops += Op.INSET; ops += tIdx(f); ops += vs.length
        vs.foreach(v => ops += cIdx(num(v, "InSetFilter")))
      case ExistsFilter(f) => attrs += f; ops += Op.EXISTS; ops += tIdx(f)
      case MissingFilter(f) => attrs += f; ops += Op.MISSING; ops += tIdx(f)
    }
    def emitCmp(op: Int, f: String, v: Any, node: String): Unit = {
      attrs += f
      ops += Op.CMP; ops += op; ops += tIdx(f); ops += cIdx(num(v, node))
    }

    emit(q)
    QueryProgram(ops.toSeq, terms.keys.toSeq, consts.toSeq, attrs.toSeq,
      probeAlts(q, an, indexedFields, textFields))
  }

  /** Sound probe-set alternatives of `q` (see class doc). Invariant:
    * a `Some` is never empty; an inner `Seq.empty` alt is the
    * "matches nothing" probe (zero candidates, zero df — the min-df
    * selection rightly prefers it). */
  private[dsl] def probeAlts(q: SearchQuery, an: graft.analysis.Analyzer,
      indexedFields: Set[String], textFields: Set[String]): Option[Seq[Seq[String]]] = {
    val none = Seq(Seq.empty[String]) // NOMATCH: sound vacuously
    def cap(xs: Seq[Seq[String]]): Seq[Seq[String]] = xs.distinct.take(MaxAlts)
    def go(x: SearchQuery): Option[Seq[Seq[String]]] = x match {
      case AllDocs => None
      case _: Should => None
      case Not(_) => None
      case _: SearchFilter => None
      case Boost(inner, _) => go(inner)
      case And(l, r) => (go(l), go(r)) match {
        case (None, None) => None
        case (a, b) => Some(cap(a.getOrElse(Nil) ++ b.getOrElse(Nil)))
      }
      case Or(l, r) => (go(l), go(r)) match {
        case (Some(a), Some(b)) =>
          Some(cap(for { x1 <- a; y1 <- b } yield (x1 ++ y1).distinct))
        case _ => None
      }
      case MatchTerm(f, t) =>
        if (!indexedFields.contains(f)) Some(none) else Some(Seq(Seq(t)))
      case MatchText(f, t) =>
        if (!indexedFields.contains(f)) Some(none)
        else go(MatchAnyTerms(f, an.analyze(t)))
      case MatchAllText(f, t) =>
        if (!indexedFields.contains(f)) Some(none)
        else go(MatchAllTerms(f, an.analyze(t)))
      case MatchPhrase(f, t, _) =>
        if (!textFields.contains(f)) Some(none)
        else {
          val ts = an.analyze(t)
          if (ts.isEmpty) Some(none) else Some(cap(ts.distinct.map(Seq(_))))
        }
      case MatchNear(f, a, b, _) =>
        if (!textFields.contains(f)) Some(none) else Some(cap(Seq(Seq(a), Seq(b))))
      case MatchAllTerms(f, ts) =>
        if (!indexedFields.contains(f)) Some(none)
        else if (ts.isEmpty) None // (true, 0.0): total
        else Some(cap(ts.distinct.map(Seq(_))))
      case MatchAnyTerms(f, ts) =>
        if (!indexedFields.contains(f)) Some(none)
        else if (ts.isEmpty) Some(none)
        else Some(Seq(ts.distinct))
      case MatchMin(f, m, ts) =>
        if (!indexedFields.contains(f)) Some(none)
        else if (m <= 0) None // always matches: total
        else if (ts.isEmpty) Some(none)
        else Some(Seq(ts.distinct))
      case Parsed(f, s) => go(Parsed.desugar(f, s))
      // dictionary-expansion leaves are rejected by compile() before
      // this runs; treat as total for safety if ever reached
      case _: MatchWildcard | _: MatchFuzzy | _: MatchRegex => None
    }
    go(q)
  }
}
