package graft.embed

import graft.text.SimpleTokenizer

/** O7/O8 — the default [[EmbeddingModel]] instance (registry name
  * `hashing-768`): a deterministic embedding kernel standing in for
  * SentenceTransformer("freelawproject/modernbert-embed-base_finetune_512")
  * (reference: inception/embedding_service.py:152-165,207-213; model name
  * inception/config.py:6-9). The real weights are unavailable offline
  * (SURVEY.md §7.4.1); we preserve the pipeline CONTRACT:
  *
  *   - input is the full prefixed chunk/query text — the asymmetric
  *     "search_document: " / "search_query: " prefixes participate in the
  *     vector (embedding_service.py:90,162), so a query and an identical
  *     document chunk embed differently, as in the nomic-style reference;
  *   - output is a 768-dim L2-normalized Float vector
  *     (README.md:15 — ModernBERT-base hidden size);
  *   - fully deterministic: same text → same vector on any JVM/executor.
  *
  * Kernel: feature hashing. Each token (and each adjacent-token bigram, so
  * word order matters) is hashed with splitmix64 into 3 (dimension, sign)
  * pairs; contributions accumulate and the result is L2-normalized.
  * Pure JVM arithmetic — safe inside whole-stage codegen / mapPartitions,
  * no per-call allocation beyond the output array.
  */
object Embedder extends EmbeddingModel {

  val Dim = 768
  override def dim: Int = Dim
  private val FeaturesPerToken = 3

  // splitmix64 + FNV-1a: ONE definition in graft.util.Hashing
  import graft.util.Hashing.{mix64, fnvRange => hashRange}

  @inline private def addFeature(vec: Array[Float], tokenHash: Long): Unit = {
    var h = tokenHash
    var k = 0
    while (k < FeaturesPerToken) {
      h = mix64(h)
      val d = java.lang.Long.remainderUnsigned(h, Dim.toLong).toInt
      val sign = if ((h >>> 62 & 1L) == 0L) 1.0f else -1.0f
      vec(d) += sign
      k += 1
    }
  }

  /** Embed one text (already prefixed by the caller).
    *
    * Single allocation-free scan: subword char ranges are hashed in place
    * — byte-identical to hashing SimpleTokenizer.encode's whitespace-
    * trimmed token strings (EmbedderProps asserts the equivalence), at a
    * fraction of the cost. This is the per-row hot loop of the 100-TB
    * embed pass, so it must not allocate per token.
    */
  def embed(text0: String): Array[Float] = {
    val text = if (text0 == null) "" else text0
    val vec = new Array[Float](Dim)
    var prev = 0L
    var first = true
    @inline def feed(h: Long): Unit = {
      addFeature(vec, h)
      if (!first) addFeature(vec, mix64(prev) ^ h) // order-sensitive bigram
      first = false
      prev = h
    }
    val n = text.length
    var i = 0
    while (i < n) {
      while (i < n && SimpleTokenizer.isWs(text.charAt(i))) i += 1
      if (i < n) {
        if (SimpleTokenizer.isWordChar(text.charAt(i))) {
          val wStart = i
          while (i < n && SimpleTokenizer.isWordChar(text.charAt(i))) i += 1
          var j = wStart
          while (j < i) {
            val k = math.min(j + SimpleTokenizer.SubwordLen, i)
            feed(hashRange(text, j, k))
            j = k
          }
        } else {
          feed(hashRange(text, i, i + 1))
          i += 1
        }
      }
    }
    l2Normalize(vec)
    vec
  }

  /** Batched variant mirroring the reference's `model.encode(sentences,
    * batch_size=processing_batch_size)` call shape
    * (embedding_service.py:207-213). On a GPU-backed kernel this is where
    * device micro-batching would live; here it is a simple map.
    */
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(embed)

  /** Query embedding: prepend the query task prefix then embed
    * (embedding_service.py:159-164).
    */
  override def embedQuery(text: String): Array[Float] =
    embed(graft.text.Chunker.QueryLead + text)

  private def l2Normalize(vec: Array[Float]): Unit = {
    var ss = 0.0
    var i = 0
    while (i < vec.length) { ss += vec(i).toDouble * vec(i); i += 1 }
    if (ss > 0) {
      val inv = (1.0 / math.sqrt(ss)).toFloat
      i = 0
      while (i < vec.length) { vec(i) *= inv; i += 1 }
    }
  }

  /** Cosine similarity between two dense vectors (shared by the ANN and
    * near-dup operators).
    */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }
}
