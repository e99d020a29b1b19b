package graft.text

import java.text.BreakIterator
import java.util.Locale

/** O4 — sentence segmentation.
  *
  * The reference uses NLTK punkt (inception/embedding_service.py:64-78,
  * English heuristics per its README.md:50). Offline on the JVM we use
  * `java.text.BreakIterator.getSentenceInstance(Locale.US)` plus a
  * punkt-style abbreviation-suppression merge pass: BreakIterator breaks
  * after EVERY terminator+space+capital, including abbreviations punkt
  * refuses to break on — single-letter initials ("Brown v. Board") and
  * its learned English abbreviation inventory ("No.", "Mr.", "etc.").
  *
  * Measured on the reference's own fixture
  * (tests/test_data/sample_opinion.txt, 1,148 chars of legal prose,
  * driven through every reference chunker test at
  * tests/test_embedding_service.py:265-476): raw BreakIterator yields 10
  * sentences vs punkt's 8 — two spurious boundaries, both at "v."
  * citations (boundary precision 7/9, recall 7/7). With the suppression
  * pass both spurious boundaries merge: 8/8 sentences, boundary
  * precision = recall = 1.0 (asserted in GoldenFixtureSpec). Single-letter
  * suppression is position-aware like punkt's initial heuristic: lowercase
  * particles ("v.", "p.") always merge; an uppercase single letter merges
  * only in name position (preceded by a capitalized token — "John F.
  * Kennedy"), so "…vitamin C. The court…" keeps its break. Residual
  * divergence (SURVEY.md §7.4.3): punkt may RE-INTRODUCE a break after a
  * known multi-letter abbreviation when the following token is a frequent
  * sentence starter; this pass never does. No such case exists in the
  * fixture.
  *
  * Pure function; the Spark UDF wrapper lives in InceptionEngine. No
  * network/retry logic is needed (the reference's retry handles NLTK
  * resource downloads, embedding_service.py:66-78 — N/A offline).
  */
object SentenceSplitter {

  /** Abbreviations the merge pass suppresses boundaries after, mirroring
    * the relevant subset of pretrained English punkt's inventory (single
    * letters are handled structurally below — punkt treats ANY
    * single-letter+period token as an initial). Lowercase, no periods.
    */
  private val Abbreviations = Set(
    "vs", "no", "nos", "mr", "mrs", "ms", "dr", "prof", "rev", "hon",
    "jr", "sr", "st", "etc", "inc", "ltd", "co", "corp", "dept", "div",
    "est", "fig", "figs", "vol", "vols", "sec", "art", "ch", "para",
    "pp", "cf", "al", "ca", "approx", "jan", "feb", "mar", "apr", "jun",
    "jul", "aug", "sep", "sept", "oct", "nov", "dec")

  /** Last word-token of a span when it ends with `<token>.` (possibly
    * followed by whitespace); the boundary after it is suppressed for
    * single letters and [[Abbreviations]].
    */
  private val AbbrevTail = """([A-Za-z]+)\.\s*$""".r

  private def endsWithAbbreviation(s: CharSequence): Boolean =
    AbbrevTail.findFirstMatchIn(s) match {
      case Some(m) =>
        val tok = m.group(1)
        // require the token to START a word (preceded by start/non-letter):
        // "schools." must not match via its tail
        val at = m.start(1)
        val standalone = at == 0 || !Character.isLetter(s.charAt(at - 1))
        if (!standalone) false
        else if (tok.length > 1)
          Abbreviations.contains(tok.toLowerCase(Locale.ROOT))
        else if (Character.isLowerCase(tok.charAt(0)))
          true // citation/page particles: "v.", "p.", "n." never end a sentence
        else
          // an UPPERCASE single letter is an initial only in name position —
          // following a capitalized token ("John F. Kennedy", "Brown B. Smith").
          // After a lowercase word ("...vitamin C.") punkt's sentence-starter
          // heuristic re-breaks; so do we.
          prevWordIsCapitalized(s, at)
      case None => false
    }

  /** Whether the word token immediately before position `at` (skipping
    * intervening non-alphanumerics) starts with an uppercase letter.
    */
  private def prevWordIsCapitalized(s: CharSequence, at: Int): Boolean = {
    var i = at - 1
    while (i >= 0 && !Character.isLetterOrDigit(s.charAt(i))) i -= 1
    if (i < 0) false
    else {
      var j = i
      while (j >= 0 && Character.isLetterOrDigit(s.charAt(j))) j -= 1
      Character.isUpperCase(s.charAt(j + 1))
    }
  }

  /** Split into trimmed, non-empty sentences. BreakIterator spans cover the
    * whole input and merging only coalesces ADJACENT spans, so only
    * whitespace is lost by trimming — preserving the chunker's
    * losslessness invariant (whitespace-stripped concatenation, reference
    * tests/test_embedding_service.py:309-315).
    */
  def split(text: String): Vector[String] = {
    if (text == null || text.isEmpty) return Vector.empty
    // BreakIterator instances are not thread-safe; they are cheap, so one
    // per call keeps the function pure and executor-thread-safe.
    val it = BreakIterator.getSentenceInstance(Locale.US)
    it.setText(text)
    // raw [start, end) spans, with abbreviation boundaries merged into
    // the following span BEFORE trimming (offsets stay contiguous)
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var start = it.first()
    var end = it.next()
    while (end != BreakIterator.DONE) {
      if (spans.nonEmpty &&
          endsWithAbbreviation(
            java.nio.CharBuffer.wrap(text, spans.last._1, spans.last._2)))
        spans(spans.length - 1) = (spans.last._1, end)
      else spans += ((start, end))
      start = end
      end = it.next()
    }
    spans.iterator
      .map { case (s, e) => text.substring(s, e).trim }
      .filter(_.nonEmpty)
      .toVector
  }
}
