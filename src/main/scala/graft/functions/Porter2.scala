package graft.functions

/** English Snowball stemmer ("Porter2") — a faithful implementation of the
  * published algorithm (snowballstem.org/algorithms/english/stemmer.html),
  * replacing the deliberately simplified [[EmailFunctions.stemLite]] as the
  * DEFAULT normalization of the F2/F4 full-text surface (reference:
  * scripts/init_db.sql:66-71 — Postgres `to_tsvector('english', …)` runs
  * exactly this stemmer). SURVEY §7 risk 1 (ts_rank ordering divergence on
  * morphology-heavy corpora) is thereby closed for the API/search surface.
  *
  * The DuckDB oracle cannot express Porter2 (its `stem()` lives in the
  * non-downloadable fts extension), so the ORACLE-CHECKED registry query
  * `f2_f4_tsrank` stays pinned to the SQL-expressible stem-lite spec, and
  * the Snowball path is pinned by Porter2Spec's golden vectors (the
  * algorithm description's own examples) plus a rows-only registry twin.
  *
  * Scope note: the tokens fed in here match `[a-z0-9]+` (the F2 pipeline
  * splits on everything else), so the algorithm's apostrophe handling
  * (step 0, initial-quote strip) is unreachable and omitted.
  */
object Porter2 {

  /** Irregular forms mapped directly, and invariant words (algorithm
    * "exceptional forms" list). */
  private val exceptions1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  /** Invariant after step 1a (algorithm "exceptional forms" part 2). */
  private val exceptions2: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  @inline private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  @inline private def isDoubleEnd(w: CharSequence): Boolean = {
    val n = w.length
    if (n < 2) false
    else {
      val c = w.charAt(n - 1)
      c == w.charAt(n - 2) && (c == 'b' || c == 'd' || c == 'f' || c == 'g' ||
        c == 'm' || c == 'n' || c == 'p' || c == 'r' || c == 't')
    }
  }

  @inline private def validLiEnding(c: Char): Boolean =
    c == 'c' || c == 'd' || c == 'e' || c == 'g' || c == 'h' || c == 'k' ||
      c == 'm' || c == 'n' || c == 'r' || c == 't'

  /** Region start: position after the first non-vowel following a vowel,
    * scanning from `from`; word length if none. (Uppercase Y is a marked
    * consonant, so isVowel(Y) is false — exactly the intent.) */
  private def regionAfterVC(w: CharSequence, from: Int): Int = {
    var i = from
    val n = w.length
    while (i < n && !isVowel(w.charAt(i))) i += 1
    while (i < n && isVowel(w.charAt(i))) i += 1
    if (i < n) i + 1 else n
  }

  /** Does `w` end in a short syllable? (a) non-vowel, vowel, non-vowel
    * other than w/x/Y; or (b) the whole word is vowel + non-vowel. */
  private def endsShortSyllable(w: CharSequence): Boolean = {
    val n = w.length
    if (n == 2)
      isVowel(w.charAt(0)) && !isVowel(w.charAt(1))
    else if (n >= 3) {
      val c = w.charAt(n - 1)
      !isVowel(c) && c != 'w' && c != 'x' && c != 'Y' &&
        isVowel(w.charAt(n - 2)) && !isVowel(w.charAt(n - 3))
    } else false
  }

  /** Pure-function memo (r14 optimization, guide §4 per-task work): token
    * streams are Zipf-distributed, so the distinct-word count is orders of
    * magnitude below the token count — one hash probe replaces the full
    * multi-step stem for every repeated word. JVM-wide and thread-safe;
    * capped so an adversarial unbounded vocabulary degrades to the
    * uncached path instead of growing the heap. stem() stays pure, the
    * memo only short-circuits recomputation. */
  private val StemCacheCap = 1 << 16
  private val stemCache =
    new java.util.concurrent.ConcurrentHashMap[String, String](1 << 12)

  def stem(word: String): String = {
    if (word.length <= 2) return word
    val cached = stemCache.get(word)
    if (cached != null) return cached
    val result = stemUncached(word)
    if (stemCache.size < StemCacheCap) stemCache.put(word, result)
    result
  }

  private def stemUncached(word: String): String = {
    exceptions1.get(word) match {
      case Some(s) => return s
      case None =>
    }

    // Mark consonant-y: initial y, or y after a vowel, becomes Y.
    val marked = new java.lang.StringBuilder(word)
    var i = 0
    while (i < marked.length) {
      if (marked.charAt(i) == 'y' &&
        (i == 0 || isVowel(marked.charAt(i - 1))))
        marked.setCharAt(i, 'Y')
      i += 1
    }
    val w = marked

    // R1 (with the gener-/commun-/arsen- prefix override) and R2 are
    // LEFT positions — every operation below touches only the suffix, so
    // they stay valid as the word shrinks or takes a trailing 'e'.
    val r1 =
      if (word.startsWith("gener") || word.startsWith("arsen")) 5
      else if (word.startsWith("commun")) 6
      else regionAfterVC(w, 0)
    val r2 = regionAfterVC(w, r1)

    @inline def endsWith(s: String): Boolean = {
      val n = w.length
      n >= s.length && {
        var k = 0
        var ok = true
        while (ok && k < s.length) {
          if (w.charAt(n - s.length + k) != s.charAt(k)) ok = false
          k += 1
        }
        ok
      }
    }
    @inline def inR1(suffixLen: Int): Boolean = w.length - suffixLen >= r1
    @inline def inR2(suffixLen: Int): Boolean = w.length - suffixLen >= r2
    @inline def drop(n: Int): Unit = w.setLength(w.length - n)
    @inline def replace(suffixLen: Int, by: String): Unit = {
      drop(suffixLen); w.append(by)
    }
    @inline def hasVowelBefore(suffixLen: Int): Boolean = {
      var k = 0
      val stop = w.length - suffixLen
      var found = false
      while (!found && k < stop) {
        if (isVowel(w.charAt(k))) found = true
        k += 1
      }
      found
    }

    // ---- Step 1a
    if (endsWith("sses")) drop(2)
    else if (endsWith("ied") || endsWith("ies")) {
      if (w.length > 4) drop(2) else drop(1)
    } else if (endsWith("us") || endsWith("ss")) ()
    else if (endsWith("s")) {
      // delete if some vowel precedes the char just before the s
      var k = 0
      var found = false
      while (!found && k < w.length - 2) {
        if (isVowel(w.charAt(k))) found = true
        k += 1
      }
      if (found) drop(1)
    }

    if (exceptions2.contains(w.toString)) return w.toString

    // ---- Step 1b (longest of eedly, ingly, edly, eed, ing, ed)
    val s1b =
      if (endsWith("eedly")) "eedly"
      else if (endsWith("ingly")) "ingly"
      else if (endsWith("edly")) "edly"
      else if (endsWith("eed")) "eed"
      else if (endsWith("ing")) "ing"
      else if (endsWith("ed")) "ed"
      else ""
    s1b match {
      case "eed" | "eedly" =>
        if (inR1(s1b.length)) replace(s1b.length, "ee")
      case "ed" | "edly" | "ing" | "ingly" =>
        if (hasVowelBefore(s1b.length)) {
          drop(s1b.length)
          if (endsWith("at") || endsWith("bl") || endsWith("iz")) w.append('e')
          else if (isDoubleEnd(w)) drop(1)
          else if (r1 >= w.length && endsShortSyllable(w)) w.append('e')
        }
      case _ => ()
    }

    // ---- Step 1c: y/Y -> i after a non-vowel that isn't the first letter
    if (w.length > 2) {
      val last = w.charAt(w.length - 1)
      if ((last == 'y' || last == 'Y') && !isVowel(w.charAt(w.length - 2)))
        w.setCharAt(w.length - 1, 'i')
    }

    // ---- Step 2 (longest match; act only if the suffix is in R1)
    locally {
      val rules: Seq[(String, () => Unit)] = Seq(
        "ization" -> (() => replace(7, "ize")),
        "ational" -> (() => replace(7, "ate")),
        "fulness" -> (() => replace(7, "ful")),
        "ousness" -> (() => replace(7, "ous")),
        "iveness" -> (() => replace(7, "ive")),
        "tional" -> (() => replace(6, "tion")),
        "biliti" -> (() => replace(6, "ble")),
        "lessli" -> (() => replace(6, "less")),
        "entli" -> (() => replace(5, "ent")),
        "ation" -> (() => replace(5, "ate")),
        "alism" -> (() => replace(5, "al")),
        "aliti" -> (() => replace(5, "al")),
        "ousli" -> (() => replace(5, "ous")),
        "iviti" -> (() => replace(5, "ive")),
        "fulli" -> (() => replace(5, "ful")),
        "enci" -> (() => replace(4, "ence")),
        "anci" -> (() => replace(4, "ance")),
        "abli" -> (() => replace(4, "able")),
        "izer" -> (() => replace(4, "ize")),
        "ator" -> (() => replace(4, "ate")),
        "alli" -> (() => replace(4, "al")),
        "bli" -> (() => replace(3, "ble")),
        "ogi" -> (() => {
          if (w.length >= 4 && w.charAt(w.length - 4) == 'l') replace(3, "og")
        }),
        "li" -> (() => {
          if (w.length >= 3 && validLiEnding(w.charAt(w.length - 3))) drop(2)
        }))
      rules.find { case (suf, _) => endsWith(suf) }.foreach {
        case (suf, act) => if (inR1(suf.length)) act()
      }
    }

    // ---- Step 3 (longest match; act only if in R1; ative needs R2)
    locally {
      val found =
        if (endsWith("ational")) Some("ational")
        else if (endsWith("tional")) Some("tional")
        else if (endsWith("alize")) Some("alize")
        else if (endsWith("icate")) Some("icate")
        else if (endsWith("iciti")) Some("iciti")
        else if (endsWith("ative")) Some("ative")
        else if (endsWith("ical")) Some("ical")
        else if (endsWith("ness")) Some("ness")
        else if (endsWith("ful")) Some("ful")
        else None
      found.foreach { suf =>
        if (inR1(suf.length)) suf match {
          case "ational" => replace(7, "ate")
          case "tional"  => replace(6, "tion")
          case "alize"   => replace(5, "al")
          case "icate" | "iciti" => replace(5, "ic")
          case "ical"    => replace(4, "ic")
          case "ness"    => drop(4)
          case "ful"     => drop(3)
          case "ative"   => if (inR2(5)) drop(5)
        }
      }
    }

    // ---- Step 4 (longest match; delete if in R2; ion needs s/t before)
    locally {
      val found =
        if (endsWith("ement")) Some("ement")
        else if (endsWith("ance")) Some("ance")
        else if (endsWith("ence")) Some("ence")
        else if (endsWith("able")) Some("able")
        else if (endsWith("ible")) Some("ible")
        else if (endsWith("ment")) Some("ment")
        else if (endsWith("ant")) Some("ant")
        else if (endsWith("ent")) Some("ent")
        else if (endsWith("ism")) Some("ism")
        else if (endsWith("ate")) Some("ate")
        else if (endsWith("iti")) Some("iti")
        else if (endsWith("ous")) Some("ous")
        else if (endsWith("ive")) Some("ive")
        else if (endsWith("ize")) Some("ize")
        else if (endsWith("ion")) Some("ion")
        else if (endsWith("al")) Some("al")
        else if (endsWith("er")) Some("er")
        else if (endsWith("ic")) Some("ic")
        else None
      found.foreach { suf =>
        if (inR2(suf.length)) {
          if (suf == "ion") {
            if (w.length > 3) {
              val before = w.charAt(w.length - 4)
              if (before == 's' || before == 't') drop(3)
            }
          } else drop(suf.length)
        }
      }
    }

    // ---- Step 5
    if (w.length > 0) {
      val last = w.charAt(w.length - 1)
      if (last == 'e') {
        if (inR2(1)) drop(1)
        else if (inR1(1)) {
          // delete unless preceded by a short syllable
          w.setLength(w.length - 1)
          val short = endsShortSyllable(w)
          if (short) w.append('e')
        }
      } else if (last == 'l') {
        if (inR2(1) && w.length >= 2 && w.charAt(w.length - 2) == 'l') drop(1)
      }
    }

    // Unmark consonant Y.
    var j = 0
    while (j < w.length) {
      if (w.charAt(j) == 'Y') w.setCharAt(j, 'y')
      j += 1
    }
    w.toString
  }
}
