package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

class PorterStemmerSpec extends AnyFunSuite {

  /** Golden pairs from the published algorithm description
    * (Porter 1980) and its canonical vocabulary. */
  val goldens: Seq[(String, String)] = Seq(
    "caresses" -> "caress",
    "ponies" -> "poni",
    "ties" -> "ti",
    "caress" -> "caress",
    "cats" -> "cat",
    "feed" -> "feed",
    "agreed" -> "agre",
    "plastered" -> "plaster",
    "bled" -> "bled",
    "motoring" -> "motor",
    "sing" -> "sing",
    "conflated" -> "conflat",
    "troubled" -> "troubl",
    "sized" -> "size",
    "hopping" -> "hop",
    "tanned" -> "tan",
    "falling" -> "fall",
    "hissing" -> "hiss",
    "fizzed" -> "fizz",
    "failing" -> "fail",
    "filing" -> "file",
    "happy" -> "happi",
    "sky" -> "sky",
    "relational" -> "relat",
    "conditional" -> "condit",
    "rational" -> "ration",
    "valenci" -> "valenc",
    "hesitanci" -> "hesit",
    "digitizer" -> "digit",
    "conformabli" -> "conform",
    "radicalli" -> "radic",
    "differentli" -> "differ",
    "vileli" -> "vile",
    "analogousli" -> "analog",
    "vietnamization" -> "vietnam",
    "predication" -> "predic",
    "operator" -> "oper",
    "feudalism" -> "feudal",
    "decisiveness" -> "decis",
    "hopefulness" -> "hope",
    "callousness" -> "callous",
    "formaliti" -> "formal",
    "sensitiviti" -> "sensit",
    "sensibiliti" -> "sensibl",
    "triplicate" -> "triplic",
    "formative" -> "form",
    "formalize" -> "formal",
    "electriciti" -> "electr",
    "electrical" -> "electr",
    "hopeful" -> "hope",
    "goodness" -> "good",
    "revival" -> "reviv",
    "allowance" -> "allow",
    "inference" -> "infer",
    "airliner" -> "airlin",
    "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust",
    "defensible" -> "defens",
    "irritant" -> "irrit",
    "replacement" -> "replac",
    "adjustment" -> "adjust",
    "dependent" -> "depend",
    "adoption" -> "adopt",
    "homologou" -> "homolog",
    "communism" -> "commun",
    "activate" -> "activ",
    "angulariti" -> "angular",
    "homologous" -> "homolog",
    "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    "probate" -> "probat",
    "rate" -> "rate",
    "cease" -> "ceas",
    "controll" -> "control",
    "roll" -> "roll")

  test("golden stem pairs") {
    val failures = goldens.collect {
      case (in, want) if PorterStemmer.stem(in) != want =>
        s"$in -> ${PorterStemmer.stem(in)} (want $want)"
    }
    assert(failures.isEmpty, failures.mkString(", "))
  }

  test("short words unchanged") {
    assert(PorterStemmer.stem("a") == "a")
    assert(PorterStemmer.stem("is") == "is")
  }
}
