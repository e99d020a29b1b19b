package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PatternMatch
import graft.ops.PatternMatch.{Down, Flat, Up}

/** Round-10 specs: the generic sequence-pattern matcher and advice-fix
  * regressions (MMR pool guard).
  */
class Round10Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("PatternMatch: V-shape over one series finds exactly the " +
      "recovery points, exposing the window values oldest-first") {
    val series = Seq(
      (1, 10.0), (2, 8.0), (3, 6.0), (4, 9.0), // V ending at t=4
      (5, 11.0), (6, 7.0), (7, 5.0), (8, 4.0), (9, 12.0)) // V at t=9
      .toDF("t", "v")
    val m = PatternMatch.matches(series, Seq.empty, "t", "v",
        Seq(Down, Down, Up))
      .select("t", "v_0", "v_1", "v_2", "v_3")
      .as[(Int, Double, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(m == Seq(
      (4, 10.0, 8.0, 6.0, 9.0),
      (9, 7.0, 5.0, 4.0, 12.0)))
  }

  test("PatternMatch: per-key partitioning never matches across keys; " +
      "series-head rows with incomplete windows never match") {
    // key a rises then falls; key b alone would complete a Down,Up
    // only if windows leaked across the a/b boundary
    val series = Seq(
      ("a", 1, 5.0), ("a", 2, 3.0), ("a", 3, 7.0),
      ("b", 1, 2.0), ("b", 2, 9.0))
      .toDF("k", "t", "v")
    val m = PatternMatch.matches(series, Seq("k"), "t", "v",
        Seq(Down, Up))
      .select("k", "t").as[(String, Int)].collect().toSeq
    assert(m == Seq(("a", 3)))
    // 2-step pattern needs 3 values; key b has 2 → no match even
    // though its last step is Up
  }

  test("PatternMatch: Flat uses exact equality and null heads stay out") {
    val series = Seq((1, 4.0), (2, 4.0), (3, 4.0), (4, 5.0))
      .toDF("t", "v")
    val m = PatternMatch.matches(series, Seq.empty, "t", "v",
        Seq(Flat, Flat))
      .select("t").as[Int].collect().toSeq
    assert(m == Seq(3)) // t=2's window reaches past the head: no match
  }

  test("PatternMatch rejects inputs already carrying v_<i> columns") {
    val bad = Seq((1, 2.0)).toDF("t", "v_0")
    val e = intercept[IllegalArgumentException] {
      PatternMatch.matches(bad, Seq.empty, "t", "v_0", Seq(Up))
    }
    assert(e.getMessage.contains("v_"))
  }

  test("dHash56: identical images collide, a brightness flip separates, " +
      "undecodable bytes hash to -1") {
    import graft.ops.Multimodal
    def png(seed: Int) = Multimodal.encodePng(16, 16,
      (x, y) => { val v = (x * y + seed) % 256; (v, v, v) })
    // inverted gradient: every column comparison flips sign
    val inv = Multimodal.encodePng(16, 16,
      (x, y) => { val v = (255 - x * y) % 256; (v, v, v) })
    val a = Multimodal.dHash56(Multimodal.resizeImage(png(7), 8, 8))
    val b = Multimodal.dHash56(Multimodal.resizeImage(png(7), 8, 8))
    val c = Multimodal.dHash56(Multimodal.resizeImage(inv, 8, 8))
    assert(a == b)
    assert(a >= 0L && a != c)
    assert(Multimodal.dHash56(Array[Byte](1, 2, 3)) == -1L)
  }

  test("Mmr.rerank reports a clear error when the pool cannot cover " +
      "the requested selection") {
    val few = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Mmr.rerank(few, "vec_id", "embedding",
        Array(1.0f, 0.0f), poolSize = 8, select = 5, lambda = 0.5)
    }
    assert(e.getMessage.contains("pool has 2"))
  }
}
