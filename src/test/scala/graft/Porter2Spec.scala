package graft

import graft.functions.Porter2
import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors for the English Snowball ("Porter2") stemmer. Every
  * pair here is either an example from the published algorithm
  * description itself (exceptional forms, the step-1a/1b example lists)
  * or a hand-traced application of the published rules (region
  * computation shown in the comments where non-obvious). */
class Porter2Spec extends AnyFunSuite {

  private def check(pairs: (String, String)*): Unit =
    pairs.foreach { case (in, out) =>
      assert(Porter2.stem(in) == out, s"stem($in): got ${Porter2.stem(in)}, want $out")
    }

  test("exceptional forms: irregulars and invariants") {
    check(
      "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
      "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
      "early" -> "earli", "only" -> "onli", "singly" -> "singl",
      "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
      "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")
  }

  test("post-1a invariants") {
    check(
      "inning" -> "inning", "outing" -> "outing", "canning" -> "canning",
      "herring" -> "herring", "earring" -> "earring",
      "proceed" -> "proceed", "exceed" -> "exceed", "succeed" -> "succeed")
  }

  test("step 1a: plural forms (algorithm examples)") {
    check(
      "caresses" -> "caress",
      "ties" -> "tie", "cries" -> "cri",
      "gas" -> "gas", "this" -> "this",
      "gaps" -> "gap", "kiwis" -> "kiwi")
  }

  test("step 1b: ed/ing with at/bl/iz, doubles, and short-word e (algorithm examples)") {
    check(
      "agreed" -> "agre",        // eed→ee in R1, then step-5 e removal leaves agre
      "conflated" -> "conflat",  // at→ate, final e then dropped in R2 by step 5
      "troubled" -> "troubl",
      "sized" -> "size",         // iz→ize; e kept (in R1 only, preceded by short syllable)
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file",        // short word after -ing → +e
      "hoping" -> "hope",
      "owed" -> "owe",           // short-syllable case (b): vowel at start
      "bled" -> "bled", "sing" -> "sing") // no vowel before the suffix
  }

  test("step 1c: y→i after a non-initial consonant") {
    check("cry" -> "cri", "by" -> "by", "say" -> "say", "happy" -> "happi",
      "enjoy" -> "enjoy") // y after vowel stays
  }

  test("step 2 suffix mappings (traced: regions in comments)") {
    check(
      // relational: R1=3 → ational→ate → relate; step5 final e is in R2 (≥5)
      "relational" -> "relat",
      // conditional: tional→tion → condition; step4 ion in R2, after t → condit
      "conditional" -> "condit",
      // rational: 'ational' starts before R1 (=3) so steps 2-3 skip; step4 al in R2 (=6)
      "rational" -> "ration",
      "valency" -> "valenc",     // y→i, enci→ence, step5 drops e (R2)
      "hesitancy" -> "hesit",    // anci→ance, step4 drops ance (R2)
      "digitizer" -> "digit",    // izer→ize, step4 drops ize (R2)
      "radically" -> "radic",    // alli→al, ical→ic; ic survives (not in R2)
      "differently" -> "differ", // entli→ent, step4 drops ent (R2)
      "vileness" -> "vile",      // ness dropped; step-5 e kept (short syllable)
      "formality" -> "formal",   // aliti→al; al not in R2 (=6)
      "sensitivity" -> "sensit", // iviti→ive, step4 drops ive
      "hopefulness" -> "hope")   // fulness→ful, step3 drops ful, e re-kept
  }

  test("steps 3-4: ic/ate/ive/ion and friends (traced)") {
    check(
      "nationally" -> "nation",  // alli→al; step4 al in R2 (=6)
      "sensational" -> "sensat", // ational→ate; step5 e in R2
      "adoption" -> "adopt",     // ion after t, in R2
      "adjustment" -> "adjust",
      "replacement" -> "replac",
      "activate" -> "activ",     // ate in R2 (=5)
      "angularity" -> "angular", // iti in R2
      "effective" -> "effect",
      "bowdlerize" -> "bowdler",
      "goodness" -> "good")
  }

  test("common inflections") {
    check(
      "running" -> "run", "runs" -> "run",
      "flies" -> "fli",
      "joins" -> "join", "joined" -> "join", "joining" -> "join",
      "windows" -> "window",
      "tuning" -> "tune",
      "databases" -> "databas",
      "queries" -> "queri",      // 1a ies→i, 1c does not apply (i not y)
      "relations" -> "relat")    // relation: step4 ion in R2 after t
  }

  test("idempotent on its own outputs for the vectors above") {
    val vocab = Seq("running", "relational", "hopefulness", "sensitivity",
      "conditional", "adoption", "replacement", "filing", "cries", "happy")
    vocab.foreach { w =>
      val once = Porter2.stem(w)
      assert(Porter2.stem(once) == once, s"non-idempotent on $w → $once")
    }
  }

  test("snowball ts pipeline matches morphology the stem-lite spec misses") {
    import graft.functions.EmailFunctions
    // "relational" and "relations" share the Porter2 stem "relat"; under
    // stem-lite they normalize to different tokens and never match.
    assert(EmailFunctions.tsQueryTerms("relational data", snowball = true) ==
      EmailFunctions.tsQueryTerms("relations data", snowball = true))
    assert(EmailFunctions.tsQueryTerms("relational data") !=
      EmailFunctions.tsQueryTerms("relations data"))
  }
}
