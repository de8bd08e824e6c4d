package graft.analysis

import graft.dsl.LuceneRegex
import org.scalatest.funsuite.AnyFunSuite

/** [[LuceneRegex.translate]] — the Lucene RegExp dialect must mean
  * what Lucene means, term-anchored, or reject cleanly. */
class LuceneRegexSpec extends AnyFunSuite {

  private def matches(pattern: String, term: String): Boolean =
    java.util.regex.Pattern
      .compile("^(?:" + LuceneRegex.translate(pattern) + ")$")
      .matcher(term).matches()

  test("plain constructs translate compatibly") {
    assert(matches("abc", "abc") && !matches("abc", "abcd"))
    assert(matches("a|b", "a") && matches("a|b", "b") && !matches("a|b", "c"))
    assert(matches("ab*c", "ac") && matches("ab*c", "abbbc"))
    assert(matches("a.c", "axc") && !matches("a.c", "ac"))
    assert(matches("a{2,3}", "aa") && matches("a{2,3}", "aaa") && !matches("a{2,3}", "a"))
    assert(matches("[a-c]d?", "b") && matches("[a-c]d?", "cd") && !matches("[a-c]d?", "d"))
    assert(matches("[^a-c]", "x") && !matches("[^a-c]", "b"))
  }

  test("Lucene-only literals: \\c is always the literal char, ^ $ are plain") {
    // Lucene has no \d/\w classes — \d is a literal 'd'
    assert(matches("\\d+", "ddd") && !matches("\\d+", "123"))
    assert(matches("a\\.c", "a.c") && !matches("a\\.c", "axc"))
    // ^ and $ are ordinary characters in Lucene
    assert(matches("^a", "^a") && !matches("^a", "a"))
    assert(matches("a$", "a$") && !matches("a$", "a"))
  }

  test("quoted strings, any-string, empty-language") {
    assert(matches("\"a.c\"", "a.c") && !matches("\"a.c\"", "abc"))
    assert(matches("@", "") && matches("@", "anything at all"))
    assert(!matches("#", "") && !matches("#", "x"))
    assert(matches("a#b|cd", "cd") && !matches("a#b|cd", "ab")) // # poisons its branch
  }

  test("numeric intervals: variable width allows leading zeros, fixed width is exact") {
    for (t <- Seq("5", "12", "20", "007")) assert(matches("<5-20>", t), t)
    for (t <- Seq("4", "21", "120", "")) assert(!matches("<5-20>", t), t)
    // equal-width bounds: fixed width, no extra leading zeros
    assert(matches("<10-99>", "42") && !matches("<10-99>", "5") &&
      !matches("<10-99>", "042"))
    // reversed bounds swap
    assert(matches("<20-5>", "7"))
    // composition with other constructs
    assert(matches("v<1-3>", "v2") && !matches("v<1-3>", "v4"))
  }

  test("complement and intersection in anchored positions") {
    assert(matches("~(ab)", "x") && matches("~(ab)", "abc") && !matches("~(ab)", "ab"))
    // top-level union branches are anchored
    assert(matches("ab|~(a.*)", "bx") && !matches("ab|~(a.*)", "ax"))
    assert(matches("ab|~(a.*)", "ab")) // first branch wins
    // intersection: both sides must hold over the whole term
    assert(matches("a.*&.*b", "axb") && !matches("a.*&.*b", "axc"))
    // mixed: not-spark and contains a
    val p = "~(\"spark\"|d.*)&.*a.*"
    assert(matches(p, "batch") && matches(p, "value"))
    assert(!matches(p, "spark") && !matches(p, "data") && !matches(p, "merge"))
    // complement inside an anchored intersection operand
    assert(matches("~(dd)&d.", "dx") && !matches("~(dd)&d.", "dd"))
  }

  test("interior complement/intersection reject at parse time") {
    for (bad <- Seq("a~b", "x(a&b)y", "(~a)*", "a(b&c)"))
      assert(intercept[IllegalArgumentException](LuceneRegex.translate(bad))
        .getMessage.contains("Lucene regexp"), bad)
  }

  test("malformed patterns reject with position info") {
    for (bad <- Seq("a)", "(ab", "[a", "a{2", "<5>", "<a-b>", "\"unterminated", "a\\"))
      intercept[IllegalArgumentException](LuceneRegex.translate(bad))
  }
}
