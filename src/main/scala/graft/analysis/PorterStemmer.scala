package graft.analysis

/** Porter stemming algorithm (M.F. Porter, 1980, "An algorithm for
  * suffix stripping") — fresh implementation of the published
  * algorithm. Used by [[Analyzers.english]] to mirror the reference's
  * `EnglishAnalyzer`/`EnglishWikipediaAnalyzer` PorterStemFilter stage
  * (reference: analyzers/EnglishWikipediaAnalyzer.scala:10-13).
  *
  * Operates on already-lowercased tokens.
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var s = step1a(word)
    s = step1b(s)
    s = step1c(s)
    s = step2(s)
    s = step3(s)
    s = step4(s)
    s = step5a(s)
    step5b(s)
  }

  /** True if s(i) is a consonant under Porter's definition ('y' after a
    * consonant counts as a vowel). */
  private def cons(s: String, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => if (i == 0) true else !cons(s, i - 1)
    case _ => true
  }

  /** Porter's measure m: number of VC sequences in the stem. */
  private def measure(s: String): Int = {
    var i = 0
    val n = s.length
    while (i < n && cons(s, i)) i += 1 // skip initial consonants
    var m = 0
    while (i < n) {
      while (i < n && !cons(s, i)) i += 1 // vowels
      if (i < n) { m += 1; while (i < n && cons(s, i)) i += 1 } // consonants
    }
    m
  }

  private def containsVowel(s: String): Boolean =
    (0 until s.length).exists(i => !cons(s, i))

  /** *d — ends with a double consonant. */
  private def doubleC(s: String): Boolean = {
    val n = s.length
    n >= 2 && s.charAt(n - 1) == s.charAt(n - 2) && cons(s, n - 1)
  }

  /** *o — ends cvc where the final c is not w, x or y. */
  private def cvc(s: String): Boolean = {
    val n = s.length
    n >= 3 && cons(s, n - 3) && !cons(s, n - 2) && cons(s, n - 1) &&
      !"wxy".contains(s.charAt(n - 1))
  }

  /** Replace suffix `suf` with `rep` if measure of the stem > m0. */
  private def replace(s: String, suf: String, rep: String, m0: Int): Option[String] =
    if (s.endsWith(suf)) {
      val stem = s.dropRight(suf.length)
      if (measure(stem) > m0) Some(stem + rep) else Some(s)
    } else None

  private def step1a(s: String): String =
    if (s.endsWith("sses")) s.dropRight(2)
    else if (s.endsWith("ies")) s.dropRight(2)
    else if (s.endsWith("ss")) s
    else if (s.endsWith("s")) s.dropRight(1)
    else s

  private def step1b(s: String): String = {
    if (s.endsWith("eed")) {
      val stem = s.dropRight(3)
      if (measure(stem) > 0) s.dropRight(1) else s
    } else {
      val stripped =
        if (s.endsWith("ed") && containsVowel(s.dropRight(2))) Some(s.dropRight(2))
        else if (s.endsWith("ing") && containsVowel(s.dropRight(3))) Some(s.dropRight(3))
        else None
      stripped match {
        case None => s
        case Some(t) =>
          if (t.endsWith("at") || t.endsWith("bl") || t.endsWith("iz")) t + "e"
          else if (doubleC(t) && !"lsz".contains(t.last)) t.dropRight(1)
          else if (measure(t) == 1 && cvc(t)) t + "e"
          else t
      }
    }
  }

  private def step1c(s: String): String =
    if (s.endsWith("y") && containsVowel(s.dropRight(1))) s.dropRight(1) + "i" else s

  private val step2Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "bli" -> "ble", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble",
    "logi" -> "log")

  private val step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private def applyFirst(s: String, rules: Seq[(String, String)], m0: Int): String =
    rules.collectFirst { case (suf, rep) if s.endsWith(suf) => (suf, rep) } match {
      case Some((suf, rep)) => replace(s, suf, rep, m0).getOrElse(s)
      case None => s
    }

  private def step2(s: String): String = applyFirst(s, step2Rules, 0)
  private def step3(s: String): String = applyFirst(s, step3Rules, 0)

  private val step4Sufs = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement", "ment",
    "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def step4(s: String): String = {
    // special case: -(s|t)ion keeps the s/t
    if (s.endsWith("ion")) {
      val stem = s.dropRight(3)
      if (stem.nonEmpty && (stem.last == 's' || stem.last == 't') && measure(stem) > 1)
        return stem
      // fall through: "ion" without s/t is not stripped, but a longer
      // suffix from the list may still match (none end in "ion")
    }
    step4Sufs.collectFirst { case suf if s.endsWith(suf) => suf } match {
      case Some(suf) =>
        val stem = s.dropRight(suf.length)
        if (measure(stem) > 1) stem else s
      case None => s
    }
  }

  private def step5a(s: String): String =
    if (s.endsWith("e")) {
      val stem = s.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !cvc(stem))) stem else s
    } else s

  private def step5b(s: String): String =
    if (s.endsWith("ll") && measure(s.dropRight(1)) > 1) s.dropRight(1) else s
}
