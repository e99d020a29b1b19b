package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Injected optimizer rule: a broadcast HINT on a relation larger than
  * `graft.broadcastGuard.maxBytes` is stripped (the join falls back to
  * whatever the planner/AQE would choose unhinted).
  *
  * Why: a user-authored `broadcast(df)` is a hard override — the planner
  * obeys it regardless of size, and at 100 TB a hinted fact table OOMs
  * the driver and every executor. Sizes also drift: the dimension that
  * was 10 MB when the hint was written is 40 GB two years later. This
  * guard turns that latent outage into a silently-correct shuffle join.
  * Statistics come from the logical plan (file sizes for scans, row
  * estimates after filters), the same numbers auto-broadcast uses.
  *
  * Off by default (maxBytes = Long.MaxValue — hints are honored); set
  * `spark.sql.graft.broadcastGuard.maxBytes` to the cluster's safe
  * broadcast ceiling to enforce.
  */
object GuardOversizedBroadcast extends Rule[LogicalPlan] {

  val ConfKey = "spark.sql.graft.broadcastGuard.maxBytes"

  /** A malformed conf value must not fail every query on the session
    * from inside the optimizer — warn (naming the key) and fall back to
    * the disabled default.
    */
  private def maxBytes: BigInt = {
    val raw = SQLConf.get.getConfString(ConfKey, Long.MaxValue.toString)
    try BigInt(raw.trim)
    catch {
      case _: NumberFormatException =>
        logWarning(s"ignoring malformed $ConfKey='$raw' (not an integer); " +
          "broadcast guard disabled")
        BigInt(Long.MaxValue)
    }
  }

  private def guard(
      hint: Option[HintInfo], side: LogicalPlan, limit: BigInt
  ): Option[HintInfo] = hint match {
    case Some(hi) if hi.strategy.contains(BROADCAST)
        && side.stats.sizeInBytes > limit =>
      logWarning(s"stripping BROADCAST hint: side is " +
        s"${side.stats.sizeInBytes} bytes > guard $limit")
      val stripped = hi.copy(strategy = None)
      if (stripped == HintInfo()) None else Some(stripped)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val limit = maxBytes
    if (limit == BigInt(Long.MaxValue)) plan
    else plan.transform {
      case j @ Join(l, r, _, _, JoinHint(lh, rh)) =>
        val (gl, gr) = (guard(lh, l, limit), guard(rh, r, limit))
        if ((gl, gr) == (lh, rh)) j
        else j.copy(hint = JoinHint(gl, gr))
    }
  }
}
