package graft.text

import java.text.BreakIterator
import java.util.Locale

/** O4 — sentence segmentation.
  *
  * The reference uses NLTK punkt (inception/embedding_service.py:64-78,
  * English heuristics per its README.md:50). Offline on the JVM we use
  * `java.text.BreakIterator.getSentenceInstance(Locale.US)`, which
  * approximates punkt; boundaries differ on some abbreviations ("v.",
  * "No.") — the chunker invariants are boundary-relative so downstream
  * tests remain valid (SURVEY.md §7.4.3).
  *
  * Pure function; the Spark UDF wrapper lives in InceptionEngine. No
  * network/retry logic is needed (the reference's retry handles NLTK
  * resource downloads, embedding_service.py:66-78 — N/A offline).
  */
object SentenceSplitter {

  /** Split into trimmed, non-empty sentences. BreakIterator spans cover the
    * whole input, so only whitespace is lost by trimming — preserving the
    * chunker's losslessness invariant (whitespace-stripped concatenation,
    * reference tests/test_embedding_service.py:309-315).
    */
  def split(text: String): Vector[String] = {
    if (text == null || text.isEmpty) return Vector.empty
    // BreakIterator instances are not thread-safe; they are cheap, so one
    // per call keeps the function pure and executor-thread-safe.
    val it = BreakIterator.getSentenceInstance(Locale.US)
    it.setText(text)
    val out = Vector.newBuilder[String]
    var start = it.first()
    var end = it.next()
    while (end != BreakIterator.DONE) {
      val s = text.substring(start, end).trim
      if (s.nonEmpty) out += s
      start = end
      end = it.next()
    }
    out.result()
  }
}
