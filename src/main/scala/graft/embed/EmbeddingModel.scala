package graft.embed

/** The pluggable embedder seam. The reference's whole design makes the
  * model a PARAMETER — `transformer_model_name` arrives via config
  * (inception/config.py:6-9) and the service loads whatever it names
  * (inception/embedding_service.py:52-66); swapping models is a config
  * edit, not a code edit. This trait is the JVM twin of that seam: a
  * real model (ONNX runtime, JNI, a remote inference client) drops into
  * the engine's `mapPartitions` by implementing `dim` + `embed` — no
  * engine code changes. Serializable because instances ride task
  * closures to executors; implementations holding non-serializable
  * native handles should lazy-init them per-JVM (the standard
  * transient-lazy pattern).
  */
trait EmbeddingModel extends Serializable {

  /** Output dimensionality — every vector returned has exactly this
    * length (the reference's hidden-size contract, 768 for ModernBERT).
    */
  def dim: Int

  /** Embed one text (already carrying its task prefix). */
  def embed(text: String): Array[Float]

  /** Batched variant mirroring `model.encode(sentences, batch_size=…)`
    * (embedding_service.py:207-213) — the device micro-batch call site;
    * a GPU-backed implementation overrides this one.
    */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map(embed)

  /** Query embedding: prepend the asymmetric query task prefix
    * (embedding_service.py:159-164), then embed.
    */
  def embedQuery(text: String): Array[Float] =
    embed(graft.text.Chunker.QueryLead + text)
}

object EmbeddingModel {

  /** The deterministic feature-hashing kernel's registry name. */
  val DefaultName = "hashing-768"

  /** Config-keyed selection (the `transformer_model_name` seam): the
    * engine resolves `EngineConfig.modelName` here at construction.
    * Unknown names fail loudly at build time, not mid-job.
    */
  def forName(name: String): EmbeddingModel = name match {
    case DefaultName | "default" => Embedder
    case other =>
      throw new IllegalArgumentException(
        s"unknown embedding model '$other' (registered: '$DefaultName'; " +
          "pass a custom EmbeddingModel instance to InceptionEngine for " +
          "unregistered models)")
  }
}
