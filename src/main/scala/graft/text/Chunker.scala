package graft.text

/** O6 — `split_text_into_chunks`, the one genuinely custom operator
  * (reference: inception/embedding_service.py:80-150). Pure function over a
  * sentence list so every reference chunker invariant
  * (tests/test_embedding_service.py:265-476) is testable without Spark.
  *
  * Faithful control flow, branch by branch:
  *   - budget starts at the lead's token count WITH special tokens
  *     (embedding_service.py:90-95);
  *   - a single sentence over `maxTokens - leadLen`: flush the current
  *     chunk if non-empty, hard-truncate the sentence to
  *     `maxTokens - leadLen` tokens, emit it as its own chunk, and reset
  *     with NO overlap (lines 100-113);
  *   - overflow when appending: flush, then carry the last
  *     `numOverlapSentences` sentences into the next chunk — unless
  *     lead + re-encoded overlap + sentence would itself overflow, in which
  *     case start clean (lines 116-141). Note the reference re-encodes the
  *     overlap sentences joined with " " (lines 124-126); we do the same
  *     (our token counts are additive so this is also exact);
  *   - final partial chunk is emitted (lines 147-149);
  *   - every chunk is `lead + sentences.mkString(" ")` where each sentence
  *     is decode(encode(sentence)) (lines 103,122,144,149).
  */
object Chunker {

  val LeadText = "search_document: "
  val QueryLead = "search_query: "

  /** Tokenized-sentence greedy packing. Returns full chunk strings
    * (lead-prefixed).
    */
  def splitSentences(
      sentences: Seq[String],
      maxTokens: Int,
      numOverlapSentences: Int
  ): Vector[String] = {
    val leadLen = SimpleTokenizer.countTokens(LeadText, addSpecialTokens = true)
    val chunks = Vector.newBuilder[String]
    // current chunk as decoded sentence strings, mirrors `current_chunks`
    var current = Vector.empty[String]
    var currentCount = leadLen

    def flushCurrent(): Unit =
      if (current.nonEmpty) chunks += (LeadText + current.mkString(" "))

    sentences.foreach { sentence =>
      val tokens = SimpleTokenizer.encode(sentence)
      val sentLen = tokens.length
      if (leadLen + sentLen > maxTokens) {
        // oversized sentence: flush, emit truncated as its own chunk, reset
        flushCurrent()
        val truncated =
          SimpleTokenizer.decode(tokens.take(math.max(0, maxTokens - leadLen)))
        chunks += (LeadText + truncated)
        current = Vector.empty
        currentCount = leadLen
      } else if (currentCount + sentLen > maxTokens) {
        val overlap = current.takeRight(math.max(0, numOverlapSentences))
        flushCurrent()
        val overlapCount =
          SimpleTokenizer.encode(overlap.mkString(" ")).length
        if (leadLen + overlapCount + sentLen > maxTokens) {
          current = Vector(SimpleTokenizer.decode(tokens))
          currentCount = leadLen + sentLen
        } else {
          current = overlap :+ SimpleTokenizer.decode(tokens)
          currentCount = leadLen + overlapCount + sentLen
        }
      } else {
        current = current :+ SimpleTokenizer.decode(tokens)
        currentCount += sentLen
      }
    }
    flushCurrent()
    chunks.result()
  }

  /** Full O4→O5→O6 path: sentence-split then pack. */
  def split(text: String, maxTokens: Int, numOverlapSentences: Int): Vector[String] =
    splitSentences(SentenceSplitter.split(text), maxTokens, numOverlapSentences)
}
