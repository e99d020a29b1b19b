package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal `private[sql]` bridge: lets the engine materialize a DataFrame
  * from a custom resolved LogicalPlan (graft.plans.AsOfJoinPlan). Lives in
  * the org.apache.spark.sql package solely to reach
  * `classic.Dataset.ofRows` — the same technique every out-of-tree Spark
  * extension uses; no Spark behavior is modified.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Interval bounds extractable from a Column predicate's simple
    * conjuncts — the driver-side analog of DataSource-V2 filter
    * pushdown, used by graft.table.TxnTable.snapshotWhere to prune a
    * manifest's file list against per-file min/max stats. Lives here
    * because the Column AST (`org.apache.spark.sql.internal.ColumnNode`)
    * is `private[sql]`. Supported shapes: =/==/<=>/</<=/>/>= between an
    * attribute and a numeric literal (either operand order; BETWEEN
    * desugars to two comparisons), composed with AND. Anything else
    * (OR, functions, casts, non-numeric literals) contributes no bound,
    * so callers prune CONSERVATIVELY — never wrongly.
    */
  def predicateBounds(
      pred: org.apache.spark.sql.Column): Map[String, (Double, Double)] = {
    import org.apache.spark.sql.internal.{ColumnNode,
      Literal => NLit, UnresolvedAttribute => NAttr,
      UnresolvedFunction => NFun}
    val NegInf = Double.NegativeInfinity
    val PosInf = Double.PositiveInfinity
    def lit(x: ColumnNode): Option[Double] = x match {
      case l: NLit => l.value match {
        case num: Number => Some(num.doubleValue)
        case _ => None
      }
      case _ => None
    }
    def name(x: ColumnNode): Option[String] = x match {
      case a: NAttr => Some(a.nameParts.mkString("."))
      case _ => None
    }
    def one(c: Option[String], b: Option[(Double, Double)]) =
      (c, b) match {
        case (Some(nm), Some(iv)) => Map(nm -> iv)
        case _ => Map.empty[String, (Double, Double)]
      }
    def walk(n: ColumnNode): Map[String, (Double, Double)] = n match {
      case f: NFun if f.functionName == "and" && f.arguments.size == 2 =>
        val (bl, br) = (walk(f.arguments(0)), walk(f.arguments(1)))
        (bl.keySet ++ br.keySet).map { k =>
          val (lo1, hi1) = bl.getOrElse(k, (NegInf, PosInf))
          val (lo2, hi2) = br.getOrElse(k, (NegInf, PosInf))
          k -> (math.max(lo1, lo2), math.min(hi1, hi2))
        }.toMap
      case f: NFun if f.arguments.size == 2 =>
        val a = f.arguments(0)
        val b = f.arguments(1)
        f.functionName match {
          case "=" | "==" | "<=>" =>
            val fwd = one(name(a), lit(b).map(x => (x, x)))
            if (fwd.nonEmpty) fwd else one(name(b), lit(a).map(x => (x, x)))
          case "<" | "<=" =>
            val fwd = one(name(a), lit(b).map(x => (NegInf, x)))
            if (fwd.nonEmpty) fwd
            else one(name(b), lit(a).map(x => (x, PosInf))) // lit < attr
          case ">" | ">=" =>
            val fwd = one(name(a), lit(b).map(x => (x, PosInf)))
            if (fwd.nonEmpty) fwd
            else one(name(b), lit(a).map(x => (NegInf, x))) // lit > attr
          case _ => Map.empty
        }
      case _ => Map.empty
    }
    walk(pred.node)
  }
}
