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
  *   - `terms` / `termFields` — aligned slot tables, deduplicated
  *     per (field, term): query terms (field = their leaf's field,
  *     so per-field IDFs resolve even when the same string appears
  *     in two fields) and filter/keyword attribute NAMES (field "")
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
  * KEYWORD-field leaves (MatchTerm/All/Any/Min on an un-analyzed
  * field — tf 1, dl 1, avgdl 1, per the scan compiler's termScore)
  * and string-valued Eq/InSet filters serialize to `KW*`/`STR*` ops
  * verified against a doc-side STRING attribute map; they never
  * probe (soundness demands probe terms live in the probed text
  * field), so a pure keyword query is a corpus pass while the usual
  * `And(text leaf, keyword filter)` rides the text probe.
  *
  * Unsupported here (use `queryJoinDsl`, which compiles per query on
  * the driver): `MatchWildcard` / `MatchFuzzy` / `MatchRegex` (their
  * Lucene multi-term rewrite expands against the term DICTIONARY at
  * compile time — a per-query driver action, not a per-row one),
  * leaves on a TEXT field other than the probe field (the verifier
  * carries one token array), and filter values that are neither
  * numeric nor strings.
  */
final case class QueryProgram(
    ops: Seq[Int],
    terms: Seq[String],
    termFields: Seq[String],
    consts: Seq[Double],
    attrFields: Seq[String],
    strAttrFields: Seq[String],
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
    // keyword-field leaves (reference: MatchTerm & friends on an
    // un-analyzed field — tf 1, dl 1, avgdl 1): verified against the
    // doc-side STRING attr map, never probed (a keyword leaf under
    // And rides its text sibling's probe; alone it is a corpus pass).
    // Layout: KWTERM f t; KWALL/KWANY f n t*n; KWMIN f m n t*n —
    // f = terms slot holding the FIELD name.
    val KWTERM = 19; val KWALL = 20; val KWANY = 21; val KWMIN = 22
    // string-valued filters: STREQ f t; STRIN f n t*n
    val STREQ = 23; val STRIN = 24
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
    // slot table keyed by (field, term): the SAME string can appear
    // as a text term, a keyword term of another field, and a filter
    // attr name — each needs its own slot because the aligned IDF
    // vector is per (field, term). Attr-name slots key under "".
    val slots = mutable.LinkedHashMap.empty[(String, String), Int]
    val consts = mutable.ArrayBuffer.empty[Double]
    val numAttrs = mutable.LinkedHashSet.empty[String]
    val strAttrs = mutable.LinkedHashSet.empty[String]

    def slotOf(f: String, t: String): Int = slots.getOrElseUpdate((f, t), slots.size)
    def tIdx(t: String): Int = slotOf(field, t)
    def nameIdx(n: String): Int = slotOf("", n)
    def cIdx(v: Double): Int = { consts += v; consts.size - 1 }
    def unsupported(what: String): Nothing = throw new IllegalArgumentException(
      s"queryJoinAst cannot distribute $what — route this query through queryJoinDsl")

    // mirrors SearchIndex.compileWith's noMatch short-circuits
    def badField(f: String): Boolean = !indexedFields.contains(f)
    def kwField(f: String): Boolean = indexedFields.contains(f) && !textFields.contains(f)
    def checkField(f: String, node: String): Unit =
      if (f != field && !kwField(f))
        unsupported(s"$node on text field '$f' (this join verifies field '$field' only)")

    def emitTerms(code: Int, ts: Seq[String], prefix: Seq[Int]): Unit = {
      ops += code
      ops ++= prefix
      ops += ts.length
      ts.foreach(t => ops += tIdx(t))
    }
    // keyword-field variant: first operand is the FIELD-name slot;
    // term slots key under the keyword field so their IDFs resolve
    // against its stats
    def emitKw(code: Int, f: String, ts: Seq[String], prefix: Seq[Int]): Unit = {
      strAttrs += f
      ops += code
      ops += nameIdx(f)
      ops ++= prefix
      ops += ts.length
      ts.foreach(t => ops += slotOf(f, t))
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
        else if (kwField(f)) {
          // KWTERM f t — single term, no count operand
          strAttrs += f
          ops += Op.KWTERM; ops += nameIdx(f); ops += slotOf(f, t)
        } else { checkField(f, "MatchTerm"); ops += Op.TERM; ops += tIdx(t) }
      case MatchText(f, t) =>
        if (badField(f)) ops += Op.NOMATCH
        else emit(MatchAnyTerms(f, an.analyze(t)))
      case MatchAllText(f, t) =>
        if (badField(f)) ops += Op.NOMATCH
        else emit(MatchAllTerms(f, an.analyze(t)))
      case MatchPhrase(f, t, slop) =>
        if (!textFields.contains(f)) ops += Op.NOMATCH
        else {
          checkField(f, "MatchPhrase")
          val ts = an.analyze(t)
          if (ts.isEmpty) ops += Op.NOMATCH
          else emitTerms(Op.PHRASE, ts, Seq(slop))
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
        else if (kwField(f)) emitKw(Op.KWALL, f, ts, Nil)
        else { checkField(f, "MatchAllTerms"); emitTerms(Op.ALL, ts, Nil) }
      case MatchAnyTerms(f, ts) =>
        if (badField(f)) ops += Op.NOMATCH
        else if (ts.isEmpty) ops += Op.NOMATCH
        else if (kwField(f)) emitKw(Op.KWANY, f, ts, Nil)
        else { checkField(f, "MatchAnyTerms"); emitTerms(Op.ANY, ts, Nil) }
      case MatchMin(f, m, ts) =>
        if (badField(f)) ops += Op.NOMATCH
        else if (ts.isEmpty) ops += (if (m <= 0) Op.TRUEZERO else Op.NOMATCH)
        else if (kwField(f)) emitKw(Op.KWMIN, f, ts, Seq(m))
        else { checkField(f, "MatchMin"); emitTerms(Op.MIN, ts, Seq(m)) }
      case Parsed(f, s) => emit(Parsed.desugar(f, s))
      case _: MatchWildcard => unsupported("MatchWildcard (dictionary expansion)")
      case _: MatchFuzzy => unsupported("MatchFuzzy (dictionary expansion)")
      case _: MatchRegex => unsupported("MatchRegex (dictionary expansion)")
      case EqFilter(f, v) => v match {
        case s: String =>
          strAttrs += f
          ops += Op.STREQ; ops += nameIdx(f); ops += slotOf(f, s)
        case n: Number => emitCmp(0, f, n.doubleValue())
        case other => unsupported(s"EqFilter value of type " +
          s"${if (other == null) "null" else other.getClass.getSimpleName}")
      }
      case GtFilter(f, v) => emitCmp(1, f, numOnly(v, "GtFilter"))
      case GeFilter(f, v) => emitCmp(2, f, numOnly(v, "GeFilter"))
      case LtFilter(f, v) => emitCmp(3, f, numOnly(v, "LtFilter"))
      case LeFilter(f, v) => emitCmp(4, f, numOnly(v, "LeFilter"))
      case RangeFilter(f, lo, hi) =>
        numAttrs += f
        ops += Op.RANGE; ops += nameIdx(f)
        ops += cIdx(numOnly(lo, "RangeFilter")); ops += cIdx(numOnly(hi, "RangeFilter"))
      case InSetFilter(f, vs) =>
        if (vs.forall(_.isInstanceOf[String])) {
          strAttrs += f
          ops += Op.STRIN; ops += nameIdx(f); ops += vs.length
          vs.foreach(v => ops += slotOf(f, v.asInstanceOf[String]))
        } else {
          numAttrs += f
          ops += Op.INSET; ops += nameIdx(f); ops += vs.length
          vs.foreach(v => ops += cIdx(numOnly(v, "InSetFilter")))
        }
      case ExistsFilter(f) => strAttrs += f; ops += Op.EXISTS; ops += nameIdx(f)
      case MissingFilter(f) => strAttrs += f; ops += Op.MISSING; ops += nameIdx(f)
    }
    def numOnly(v: Any, node: String): Double = v match {
      case n: Number => n.doubleValue()
      case other => unsupported(s"$node value of type " +
        s"${if (other == null) "null" else other.getClass.getSimpleName}")
    }
    def emitCmp(op: Int, f: String, v: Double): Unit = {
      numAttrs += f
      ops += Op.CMP; ops += op; ops += nameIdx(f); ops += cIdx(v)
    }

    emit(q)
    val slotSeq = slots.keys.toSeq
    QueryProgram(ops.toSeq, slotSeq.map(_._2), slotSeq.map(_._1),
      consts.toSeq, numAttrs.toSeq, strAttrs.toSeq,
      probeAlts(q, an, indexedFields, textFields))
  }

  /** Sound probe-set alternatives of `q` (see class doc). Invariant:
    * a `Some` is never empty; an inner `Seq.empty` alt is the
    * "matches nothing" probe (zero candidates, zero df — the min-df
    * selection rightly prefers it). A probe set is sound only if
    * every matching doc must contain one of its terms IN THE PROBE
    * TEXT FIELD — so KEYWORD-field leaves contribute None (their
    * terms are not in the probed postings; under And they ride the
    * text sibling's probe, alone they are a corpus pass). */
  private[dsl] def probeAlts(q: SearchQuery, an: graft.analysis.Analyzer,
      indexedFields: Set[String], textFields: Set[String]): Option[Seq[Seq[String]]] = {
    val none = Seq(Seq.empty[String]) // NOMATCH: sound vacuously
    def cap(xs: Seq[Seq[String]]): Seq[Seq[String]] = xs.distinct.take(MaxAlts)
    // keyword leaves verify against the attr map, not the postings
    def kw(f: String): Boolean = indexedFields.contains(f) && !textFields.contains(f)
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
        if (!indexedFields.contains(f)) Some(none)
        else if (kw(f)) None
        else Some(Seq(Seq(t)))
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
        else if (kw(f)) None
        else Some(cap(ts.distinct.map(Seq(_))))
      case MatchAnyTerms(f, ts) =>
        if (!indexedFields.contains(f)) Some(none)
        else if (ts.isEmpty) Some(none)
        else if (kw(f)) None
        else Some(Seq(ts.distinct))
      case MatchMin(f, m, ts) =>
        if (!indexedFields.contains(f)) Some(none)
        else if (m <= 0) None // always matches: total
        else if (ts.isEmpty) Some(none)
        else if (kw(f)) None
        else Some(Seq(ts.distinct))
      case Parsed(f, s) => go(Parsed.desugar(f, s))
      // dictionary-expansion leaves are rejected by compile() before
      // this runs; treat as total for safety if ever reached
      case _: MatchWildcard | _: MatchFuzzy | _: MatchRegex => None
    }
    go(q)
  }
}
