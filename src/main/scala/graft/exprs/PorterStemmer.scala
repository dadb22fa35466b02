package graft.exprs

/** Classic Porter stemming algorithm (Porter, 1980 — public algorithm),
  * used by the `en_stem` tokenizer. The reference engine delegates to a
  * Snowball ("Porter2") stemmer via tantivy
  * (`/root/reference/src/config/mod.rs:72-76`); classic Porter differs from
  * Porter2 on a small tail of words — a documented, deliberate divergence
  * (both are standard published stemmers; neither output is "wrong" for
  * search recall purposes).
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word == null || word.length <= 2) return word
    val w = new StringBuilder(word)
    step1a(w); step1b(w); step1c(w); step2(w); step3(w); step4(w); step5a(w); step5b(w)
    w.toString
  }

  private def isConsonant(w: StringBuilder, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y'                         => i == 0 || !isConsonant(w, i - 1)
    case _                           => true
  }

  /** Measure m of the stem w[0..end]: number of VC sequences. */
  private def measure(w: StringBuilder, end: Int): Int = {
    var m = 0
    var i = 0
    // skip initial consonants
    while (i <= end && isConsonant(w, i)) i += 1
    while (i <= end) {
      while (i <= end && !isConsonant(w, i)) i += 1
      if (i > end) return m
      m += 1
      while (i <= end && isConsonant(w, i)) i += 1
    }
    m
  }

  private def containsVowel(w: StringBuilder, end: Int): Boolean =
    (0 to end).exists(i => !isConsonant(w, i))

  private def endsDoubleConsonant(w: StringBuilder): Boolean = {
    val n = w.length
    n >= 2 && w.charAt(n - 1) == w.charAt(n - 2) && isConsonant(w, n - 1)
  }

  /** cvc pattern at the end, where the final c is not w, x or y. */
  private def endsCvc(w: StringBuilder): Boolean = {
    val n = w.length
    if (n < 3) return false
    val c = w.charAt(n - 1)
    isConsonant(w, n - 3) && !isConsonant(w, n - 2) && isConsonant(w, n - 1) &&
    c != 'w' && c != 'x' && c != 'y'
  }

  private def endsWith(w: StringBuilder, s: String): Boolean = {
    val n = w.length
    n >= s.length && w.substring(n - s.length) == s
  }

  /** If word ends with `suffix` and measure of the remaining stem > m0,
    * replace suffix with `repl`; returns true if the suffix matched. */
  private def replace(w: StringBuilder, suffix: String, repl: String, m0: Int): Boolean = {
    if (!endsWith(w, suffix)) return false
    val stemEnd = w.length - suffix.length - 1
    if (stemEnd >= 0 && measure(w, stemEnd) > m0) {
      w.setLength(w.length - suffix.length)
      w.append(repl)
    }
    true
  }

  private def step1a(w: StringBuilder): Unit = {
    if (endsWith(w, "sses")) w.setLength(w.length - 2)
    else if (endsWith(w, "ies")) w.setLength(w.length - 2)
    else if (endsWith(w, "ss")) ()
    else if (endsWith(w, "s")) w.setLength(w.length - 1)
  }

  private def step1b(w: StringBuilder): Unit = {
    var extra = false
    if (endsWith(w, "eed")) {
      if (measure(w, w.length - 4) > 0) w.setLength(w.length - 1)
    } else if (endsWith(w, "ed") && containsVowel(w, w.length - 3)) {
      w.setLength(w.length - 2); extra = true
    } else if (endsWith(w, "ing") && w.length > 3 && containsVowel(w, w.length - 4)) {
      w.setLength(w.length - 3); extra = true
    }
    if (extra) {
      if (endsWith(w, "at") || endsWith(w, "bl") || endsWith(w, "iz")) w.append('e')
      else if (endsDoubleConsonant(w) && !"lsz".contains(w.charAt(w.length - 1)))
        w.setLength(w.length - 1)
      else if (measure(w, w.length - 1) == 1 && endsCvc(w)) w.append('e')
    }
  }

  private def step1c(w: StringBuilder): Unit =
    if (endsWith(w, "y") && containsVowel(w, w.length - 2))
      w.setCharAt(w.length - 1, 'i')

  private val step2Rules = List(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private def step2(w: StringBuilder): Unit =
    step2Rules.exists { case (s, r) => replace(w, s, r, 0) }

  private val step3Rules = List(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private def step3(w: StringBuilder): Unit =
    step3Rules.exists { case (s, r) => replace(w, s, r, 0) }

  private val step4Suffixes = List(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement", "ment",
    "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def step4(w: StringBuilder): Unit = {
    // "ion" only strips after s or t.
    if (endsWith(w, "ion")) {
      val stemEnd = w.length - 4
      if (stemEnd >= 0 && (w.charAt(stemEnd) == 's' || w.charAt(stemEnd) == 't') &&
          measure(w, stemEnd) > 1) {
        w.setLength(w.length - 3)
      }
      return
    }
    step4Suffixes.exists { s =>
      if (endsWith(w, s)) {
        val stemEnd = w.length - s.length - 1
        if (stemEnd >= 0 && measure(w, stemEnd) > 1) w.setLength(w.length - s.length)
        true
      } else false
    }
  }

  private def step5a(w: StringBuilder): Unit =
    if (endsWith(w, "e")) {
      val m = measure(w, w.length - 2)
      if (m > 1) w.setLength(w.length - 1)
      else if (m == 1) {
        // endsCvc must be evaluated on the stem without the final e.
        w.setLength(w.length - 1)
        if (endsCvc(w)) w.append('e')
      }
    }

  private def step5b(w: StringBuilder): Unit =
    if (measure(w, w.length - 1) > 1 && endsDoubleConsonant(w) &&
        w.charAt(w.length - 1) == 'l')
      w.setLength(w.length - 1)
}
