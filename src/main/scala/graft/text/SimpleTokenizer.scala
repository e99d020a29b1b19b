package graft.text

/** O5 — deterministic, self-contained tokenizer standing in for the HF
  * ModernBERT BPE tokenizer (reference: inception/main.py:53-55 and uses in
  * embedding_service.py:86-91,105-107,124-126,132,136,144).
  *
  * The real BPE vocabulary is unavailable offline (SURVEY.md §7.4.2), so we
  * re-specify the token cost model while preserving every property the
  * chunker relies on:
  *
  *   - `encode` → sequence of token pieces; `count = pieces.length`
  *   - `decode(encode(s)) == s` for trimmed `s` (exact round-trip — BPE has
  *     the same property for already-clean text)
  *   - token counts are CONTEXT-FREE and ADDITIVE:
  *     `count(a + " " + b) == count(a) + count(b)` — this makes the
  *     chunker's budget arithmetic exact (no re-encode drift) while the
  *     reference must re-encode joined overlap text
  *     (embedding_service.py:124-126); we still re-encode where the
  *     reference does, for semantic fidelity.
  *   - truncation to n tokens can cut inside a long word at a subword
  *     boundary, like BPE.
  *
  * Cost model (BPE-ish): a word run `[A-Za-z0-9_]+` costs
  * `ceil(len/4)` tokens (~4 chars/token mirrors observed BPE fertility on
  * English prose); every other non-space char costs 1; whitespace is
  * carried on the following token and costs 0. `addSpecialTokens` adds 2
  * ([CLS]/[SEP] analog) to the COUNT only — mirroring the reference, which
  * includes special tokens in the lead budget (embedding_service.py:90-95)
  * but never decodes them.
  */
object SimpleTokenizer {

  val SubwordLen = 4
  val NumSpecialTokens = 2

  @inline def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  @inline def isWs(c: Char): Boolean = Character.isWhitespace(c)

  /** Tokenize into pieces; concatenation of pieces == input minus trailing
    * whitespace. Each piece carries its leading whitespace.
    */
  def encode(text: String): Vector[String] = {
    if (text == null || text.isEmpty) return Vector.empty
    val out = Vector.newBuilder[String]
    val n = text.length
    var i = 0
    while (i < n) {
      val wsStart = i
      while (i < n && isWs(text.charAt(i))) i += 1
      if (i < n) {
        val ws = text.substring(wsStart, i)
        val c = text.charAt(i)
        if (isWordChar(c)) {
          val wStart = i
          while (i < n && isWordChar(text.charAt(i))) i += 1
          // slice word into SubwordLen-char subwords; first carries the ws
          var j = wStart
          var first = true
          while (j < i) {
            val k = math.min(j + SubwordLen, i)
            val piece = text.substring(j, k)
            out += (if (first) ws + piece else piece)
            first = false
            j = k
          }
        } else {
          out += (ws + c)
          i += 1
        }
      }
      // trailing whitespace (i == n after ws scan) is dropped
    }
    out.result()
  }

  /** Exact inverse of encode for trimmed input. */
  def decode(tokens: Seq[String]): String = {
    val s = tokens.mkString
    // leading ws can survive on the first token if the input had it
    var b = 0
    while (b < s.length && isWs(s.charAt(b))) b += 1
    s.substring(b)
  }

  def countTokens(text: String, addSpecialTokens: Boolean = false): Int =
    encode(text).length + (if (addSpecialTokens) NumSpecialTokens else 0)
}
