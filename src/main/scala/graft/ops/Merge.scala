package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-free MERGE/upsert over immutable columnar storage — the
  * snapshot-rewrite pattern engines without a transactional table format
  * use: union the base snapshot with the change set and keep the
  * highest-version row per key.
  *
  * Scale design (100 TB): one hash aggregation on the key — `max_by`
  * carries the whole row as a struct, so partial aggregation reduces each
  * partition to at most one candidate row per key before the shuffle
  * (shuffle volume ≈ |changed keys| + |base keys|, never |rows| × width
  * twice). No window sort, no self-join. For partitioned tables, filter
  * both sides to the touched partitions first and rewrite only those.
  */
object Merge {

  /** Keep the latest version of every key across base ∪ updates.
    *
    * @param base       current snapshot
    * @param updates    change rows (same schema), higher `versionCol` wins
    * @param keyCols    merge key
    * @param versionCol monotonically increasing version/timestamp column;
    *                   ties must not occur across base and updates (give
    *                   updates a strictly newer version)
    */
  def upsert(
      base: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      versionCol: String
  ): DataFrame = {
    val cols = base.columns
    require(updates.columns.sameElements(cols),
      "base and updates must share a schema")
    val all = base.unionByName(updates)
    val payload = struct(cols.toSeq.map(col): _*)
    all
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, col(versionCol)).as("r"))
      .select(cols.toSeq.map(c => col(s"r.$c").as(c)): _*)
  }

  /** Anti-join delete: rows of `base` whose key appears in `tombstones`
    * are dropped (the GDPR/right-to-be-forgotten shape; one shuffle, or
    * broadcast when the tombstone set is small).
    */
  def applyDeletes(
      base: DataFrame,
      tombstones: DataFrame,
      keyCols: Seq[String]
  ): DataFrame =
    base.join(tombstones.select(keyCols.map(col): _*).distinct(),
      keyCols, "left_anti")
}
