package graft.dsl

import scala.collection.mutable.ListBuffer

/** Lucene RegExp dialect → Java regex translator.
  *
  * The reference's `MatchRegex` executes as a Lucene `RegexpQuery`,
  * whose pattern language is `org.apache.lucene.util.automaton
  * .RegExp` (default ALL feature flags) — NOT Java regex: `<n-m>`
  * is a numeric interval, `~` complement, `&` intersection, `@`
  * any-string, `#` empty-language, `"..."` a literal string, `\c`
  * always the literal character (Lucene has no `\d`/`\w` classes),
  * and `^`/`$` are ordinary characters (Lucene matches the whole
  * term implicitly). Evaluating such a pattern as Java regex
  * silently means something else; this translator parses the Lucene
  * grammar and emits an equivalent Java pattern for the engine's
  * anchored whole-term match (`rlike("^(?:" + out + ")$")`).
  *
  * Supported: concatenation, union `|`, quantifiers `? * + {n}
  * {n,} {n,m}`, character classes (ranges, `^` negation), `.`
  * (any char, including line terminators — hence `[\s\S]`),
  * `( )` grouping, `@`, `#`, quoted literals, `\c` escapes,
  * `<n-m>` intervals (equal-width bounds match fixed-width digit
  * strings; otherwise any width with optional leading zeros), and
  * `~` / `&` in ANCHORED positions — spanning the whole term, a
  * whole top-level union branch, or an operand of an anchored
  * intersection — where they translate to negative/positive
  * lookaheads against the term end.
  *
  * Rejected with `IllegalArgumentException` AT PARSE TIME (the
  * verdict's contract: reject rather than silently reinterpret):
  * `~` or `&` nested inside a concatenation, repetition or class —
  * a DFA complement/intersection has no general Java-regex
  * equivalent at an interior position. */
object LuceneRegex {

  private sealed trait Node
  private final case class Union(xs: List[Node]) extends Node
  private final case class Inter(xs: List[Node]) extends Node
  private final case class Concat(xs: List[Node]) extends Node
  private final case class Repeat(x: Node, q: String) extends Node
  private final case class Compl(x: Node) extends Node
  private final case class Clazz(java: String) extends Node
  private final case class Lit(c: Char) extends Node
  private case object AnyChar extends Node
  private case object AnyStr extends Node
  private case object EmptyLang extends Node
  private final case class Quoted(s: String) extends Node
  private final case class Interval(lo: Long, hi: Long, width: Int) extends Node
  private final case class Group(x: Node) extends Node
  private case object Eps extends Node

  /** Translates `pattern` (Lucene RegExp dialect) to an UNANCHORED
    * Java regex; callers wrap it as `^(?:...)$` for the whole-term
    * match Lucene performs implicitly. */
  def translate(pattern: String): String = {
    val p = new P(pattern)
    val ast = p.parseUnion()
    if (p.i < pattern.length) p.fail(s"unexpected '${pattern.charAt(p.i)}'")
    render(ast, anchored = true)
  }

  private def quoteChar(c: Char): String =
    if ("\\.[]{}()*+?^$|".indexOf(c) >= 0) "\\" + c else c.toString

  private def render(n: Node, anchored: Boolean): String = n match {
    case Union(xs) => xs.map(x => "(?:" + render(x, anchored) + ")").mkString("|")
    case Inter(xs) =>
      if (!anchored) throw new IllegalArgumentException(
        "Lucene regexp: intersection (&) is only supported where it spans the whole term")
      xs.init.map(x => "(?=(?:" + render(x, anchored = true) + ")$)").mkString +
        "(?:" + render(xs.last, anchored = true) + ")"
    case Compl(x) =>
      if (!anchored) throw new IllegalArgumentException(
        "Lucene regexp: complement (~) is only supported where it spans the whole term")
      "(?!(?:" + render(x, anchored = true) + ")$)[\\s\\S]*"
    case Concat(xs) => xs.map(x => render(x, anchored = false)).mkString
    case Repeat(x, q) => "(?:" + render(x, anchored = false) + ")" + q
    case Clazz(java) => java
    case Lit(c) => quoteChar(c)
    case AnyChar => "[\\s\\S]"
    case AnyStr => "[\\s\\S]*"
    case EmptyLang => "(?!)"
    case Quoted(s) => if (s.isEmpty) "" else java.util.regex.Pattern.quote(s)
    case Interval(lo, hi, w) => "(?:" + intervalRegex(lo, hi, w) + ")"
    case Group(x) => "(?:" + render(x, anchored) + ")"
    case Eps => ""
  }

  // ---------------- numeric intervals ----------------

  private def digitsPat(k: Int): String =
    if (k <= 0) "" else if (k == 1) "[0-9]" else s"[0-9]{$k}"

  /** Same-length decimal range regex, standard prefix-split
    * construction. */
  private def sameLen(lo: String, hi: String): String = {
    if (lo == hi) return lo
    var i = 0
    while (lo.charAt(i) == hi.charAt(i)) i += 1
    val prefix = lo.substring(0, i)
    val l0 = lo.charAt(i) - '0'
    val h0 = hi.charAt(i) - '0'
    val rest = lo.length - i - 1
    def digit(d: Int) = d.toString
    def cls(a: Int, b: Int) = if (a == b) digit(a) else s"[$a-$b]"
    val parts = ListBuffer.empty[String]
    if (rest == 0) parts += cls(l0, h0)
    else {
      val loTail = lo.substring(i + 1)
      val hiTail = hi.substring(i + 1)
      val nines = "9" * rest
      val zeros = "0" * rest
      if (loTail == zeros && hiTail == nines) parts += cls(l0, h0) + digitsPat(rest)
      else {
        if (loTail == zeros) parts += digit(l0) + digitsPat(rest)
        else parts += digit(l0) + sameLen(loTail, nines)
        if (h0 - l0 >= 2) parts += cls(l0 + 1, h0 - 1) + digitsPat(rest)
        if (hiTail == nines) parts += digit(h0) + digitsPat(rest)
        else parts += digit(h0) + sameLen(zeros, hiTail)
      }
    }
    prefix + (if (parts.size == 1) parts.head else "(?:" + parts.mkString("|") + ")")
  }

  private def intervalRegex(lo0: Long, hi0: Long, width: Int): String = {
    val (lo, hi) = if (lo0 <= hi0) (lo0, hi0) else (hi0, lo0)
    if (width > 0) {
      def pad(v: Long) = {
        val s = v.toString
        "0" * (width - s.length) + s
      }
      sameLen(pad(lo), pad(hi))
    } else {
      val dLo = lo.toString.length
      val dHi = hi.toString.length
      val parts = ListBuffer.empty[String]
      var d = dLo
      while (d <= dHi) {
        val segLo = math.max(lo, if (d == 1) 0L else math.pow(10, d - 1).toLong)
        val segHi = math.min(hi, math.pow(10, d).toLong - 1)
        if (segLo <= segHi) parts += sameLen(segLo.toString, segHi.toString)
        d += 1
      }
      "0*(?:" + parts.mkString("|") + ")"
    }
  }

  // ---------------- parser (Lucene RegExp grammar) ----------------

  private final class P(s: String) {
    var i = 0
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"Lucene regexp: $msg at position $i in '$s'")
    private def peek: Int = if (i < s.length) s.charAt(i) else -1

    def parseUnion(): Node = {
      val first = parseInter()
      if (peek == '|') {
        i += 1
        parseUnion() match {
          case Union(xs) => Union(first :: xs)
          case x => Union(List(first, x))
        }
      } else first
    }

    private def parseInter(): Node = {
      val first = parseConcat()
      if (peek == '&') {
        i += 1
        parseInter() match {
          case Inter(xs) => Inter(first :: xs)
          case x => Inter(List(first, x))
        }
      } else first
    }

    private def parseConcat(): Node = {
      val xs = ListBuffer.empty[Node]
      while (i < s.length && peek != '|' && peek != '&' && peek != ')')
        xs += parseRepeat()
      if (xs.isEmpty) Eps
      else if (xs.size == 1) xs.head
      else Concat(xs.toList)
    }

    private def parseRepeat(): Node = {
      var base = parseComplement()
      var loop = true
      while (loop) peek match {
        case '?' => i += 1; base = Repeat(base, "?")
        case '*' => i += 1; base = Repeat(base, "*")
        case '+' => i += 1; base = Repeat(base, "+")
        case '{' =>
          i += 1
          val n = parseDigits("repeat count")
          val q = peek match {
            case ',' =>
              i += 1
              if (peek == '}') s"{$n,}"
              else s"{$n,${parseDigits("repeat bound")}}"
            case _ => s"{$n}"
          }
          if (peek != '}') fail("expected '}'")
          i += 1
          base = Repeat(base, q)
        case _ => loop = false
      }
      base
    }

    private def parseComplement(): Node =
      if (peek == '~') { i += 1; Compl(parseComplement()) } else parseClassExp()

    private def parseClassExp(): Node = peek match {
      case '[' =>
        i += 1
        val sb = new StringBuilder("[")
        if (peek == '^') { i += 1; sb.append('^') }
        if (peek == ']') fail("empty character class")
        var first = true
        while (peek != ']') {
          if (i >= s.length) fail("unterminated character class")
          val c1 = parseClassChar()
          if (peek == '-' && i + 1 < s.length && s.charAt(i + 1) != ']') {
            i += 1
            val c2 = parseClassChar()
            sb.append(classChar(c1)).append('-').append(classChar(c2))
          } else sb.append(classChar(c1))
          first = false
        }
        i += 1
        Clazz(sb.append(']').toString)
      case _ => parseSimple()
    }

    private def parseClassChar(): Char = peek match {
      case '\\' =>
        i += 1
        if (i >= s.length) fail("dangling backslash")
        val c = s.charAt(i); i += 1; c
      case -1 => fail("unterminated character class")
      case c => i += 1; c.toChar
    }

    private def classChar(c: Char): String =
      if ("\\]^[&-".indexOf(c) >= 0) "\\" + c else c.toString

    private def parseSimple(): Node = peek match {
      case '.' => i += 1; AnyChar
      case '#' => i += 1; EmptyLang
      case '@' => i += 1; AnyStr
      case '"' =>
        i += 1
        val j = s.indexOf('"', i)
        if (j < 0) fail("unterminated quoted string")
        val lit = s.substring(i, j)
        i = j + 1
        Quoted(lit)
      case '(' =>
        i += 1
        if (peek == ')') { i += 1; Eps }
        else {
          val inner = parseUnion()
          if (peek != ')') fail("expected ')'")
          i += 1
          Group(inner)
        }
      case '<' =>
        i += 1
        val loS = takeDigits()
        if (loS.isEmpty || peek != '-') fail("interval must be <min-max>")
        i += 1
        val hiS = takeDigits()
        if (hiS.isEmpty || peek != '>') fail("interval must be <min-max>")
        i += 1
        if (loS.length > 18 || hiS.length > 18) fail("interval bound too large")
        val width = if (loS.length == hiS.length) loS.length else 0
        Interval(loS.toLong, hiS.toLong, width)
      case '\\' =>
        i += 1
        if (i >= s.length) fail("dangling backslash")
        val c = s.charAt(i); i += 1
        Lit(c)
      case -1 => fail("unexpected end of pattern")
      case c => i += 1; Lit(c.toChar)
    }

    private def takeDigits(): String = {
      val start = i
      while (i < s.length && s.charAt(i).isDigit) i += 1
      s.substring(start, i)
    }

    private def parseDigits(what: String): Long = {
      val d = takeDigits()
      if (d.isEmpty) fail(s"expected $what")
      if (d.length > 9) fail(s"$what too large")
      d.toLong
    }
  }
}
