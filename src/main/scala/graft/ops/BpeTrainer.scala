package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016,
  * arXiv:1508.07909 — the merge loop every subword tokenizer ships):
  * repeat k times over the (word, freq) table: count adjacent symbol
  * pairs weighted by word frequency, take the arg-max pair, merge it
  * everywhere. The reference engine has no tokenizer training at all
  * (it serves a fixed pretrained tokenizer); this is engine-extension
  * surface for the 100 TB training-data story, where the vocabulary
  * must be learned FROM the corpus being curated.
  *
  * Scale shape, per iteration:
  *   - pair counting is explode → hash-aggregate on the pair key — one
  *     keyed shuffle over O(vocab × avg word length) rows (the DISTINCT
  *     word table, not the corpus: frequencies were aggregated once up
  *     front, so corpus size only ever enters through that first count);
  *   - the arg-max collects exactly ONE row to the driver per iteration
  *     (k rows total — the same O(iterations) driver state as
  *     Clustering.kMeans' centroid collect);
  *   - the merge itself is a narrow per-row string replace — no shuffle.
  *
  * Symbol sequences are brace-wrapped (`{l}{o}{w}{</w>}`) rather than
  * space-joined: a space-joined merge pattern shares its boundary
  * space with the next match, so `replace` (non-overlapping,
  * left-to-right in BOTH Spark and DuckDB) would silently skip every
  * second adjacent occurrence (`x a b a b y` → only the first `a b`
  * merges). Brace-wrapped patterns share no characters between
  * adjacent matches, so plain replace implements exactly the greedy
  * left-to-right merge BPE specifies — and the DuckDB oracle replays
  * it with the same `replace` semantics, bit-identically.
  *
  * Lineage: each iteration persists its sequence table and unpersists
  * the parent AFTER materializing (the Clustering.kMeans discipline);
  * every `checkpointEvery` iterations the lineage is truncated with
  * localCheckpoint so a production-sized merge count (30k+) cannot
  * accumulate an unbounded plan.
  */
object BpeTrainer {

  /** One learned merge: step (1-based), the two symbols, and the
    * weighted pair count that won the arg-max.
    */
  final case class Merge(step: Int, lhs: String, rhs: String, n: Long)

  /** Symbols of a brace-wrapped sequence column. */
  private def symsOf(seqCol: String): Column =
    expr(s"split(trim(BOTH '{}' FROM $seqCol), '\\\\}\\\\{')")

  /** (word, freq) → the initial brace-wrapped character sequence with
    * the word-end marker. The word column rides along untouched, so the
    * trained table doubles as the ENCODING of the training corpus
    * (final segmentation per word).
    */
  def seed(words: DataFrame, wordCol: String, freqCol: String): DataFrame =
    words.select(
      col(wordCol).as("word"),
      concat(lit("{"),
        array_join(expr(s"filter(split($wordCol, ''), c -> c <> '')"), "}{"),
        lit("}{</w>}")).as("seq"),
      col(freqCol).cast("long").as("freq"))

  /** Apply an already-learned merge list to fresh words (the tokenizer
    * ENCODE path): merges apply in training order, each a narrow
    * per-row replace — a zero-shuffle codegen projection chain, however
    * long the merge list. Output: (word, seq, freq, n_tokens).
    */
  def encode(
      words: DataFrame,
      wordCol: String,
      freqCol: String,
      merges: Seq[Merge]): DataFrame = {
    val encoded = merges.foldLeft(seed(words, wordCol, freqCol)) { (df, m) =>
      require(!(m.lhs + m.rhs).exists(c => c == '\'' || c == '\\' ||
        c == '{' || c == '}'),
        s"unmergeable symbol characters in: '${m.lhs}' + '${m.rhs}'")
      df.withColumn("seq",
        expr(s"replace(seq, '{${m.lhs}}{${m.rhs}}', '{${m.lhs}${m.rhs}}')"))
    }
    encoded.withColumn("n_tokens", size(symsOf("seq")))
  }

  /** Weighted adjacent-pair counts of a sequence table — the inner
    * aggregate of the training loop, exposed for reuse/specs.
    * Output: (lhs, rhs, n).
    */
  def pairCounts(seqs: DataFrame): DataFrame =
    seqs
      .withColumn("syms", symsOf("seq"))
      .select(col("freq"), explode(expr(
        """CASE WHEN size(syms) < 2 THEN array()
           ELSE transform(sequence(0, size(syms) - 2),
                  i -> struct(syms[i] AS lhs, syms[i + 1] AS rhs)) END"""))
        .as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("freq")).as("n"))

  /** Run `numMerges` BPE merge iterations. Returns the learned merge
    * list (driver-side, O(numMerges)) and the final sequence table
    * (unpersisted — callers wanting it materialized should persist).
    */
  def train(
      words: DataFrame,
      wordCol: String,
      freqCol: String,
      numMerges: Int,
      checkpointEvery: Int = 16): (Seq[Merge], DataFrame) = {
    require(numMerges >= 1, "numMerges must be >= 1")
    var seqs = seed(words, wordCol, freqCol)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var prev: Option[DataFrame] = None
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      // r16: no dedicated materialization job — the argmax collect below
      // is the step's one action and it materializes cur (lazy
      // checkpoint / persist) as a side effect; the previous step's
      // blocks are released only after that collect has run.
      val cur = if (step % checkpointEvery == 0) seqs.localCheckpoint(false)
        else seqs.persist()
      // deterministic arg-max: count desc, then (lhs, rhs) lexicographic
      val top = pairCounts(cur)
        .orderBy(col("n").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      prev.foreach(_.unpersist())
      prev = Some(cur)
      if (top.isEmpty) exhausted = true // every word fully merged
      else {
        val (l, r, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        // symbols are corpus characters and their concatenations — the
        // literal embedding below is only safe while that stays true
        require(!(l + r).exists(c => c == '\'' || c == '\\' || c == '{' ||
          c == '}'), s"unmergeable symbol characters in: '$l' + '$r'")
        merges += Merge(step, l, r, n)
        seqs = cur.withColumn("seq",
          expr(s"replace(seq, '{$l}{$r}', '{$l$r}')"))
        step += 1
      }
    }
    (merges.toSeq, seqs)
  }
}
