package graft

import org.apache.spark.sql.functions._
import graft.operators.Bloom

/** Bloom join prefilters (E10): bit-identical to the exact joins
  * they accelerate, with a measurable map-side reduction. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = (1L to 5000L).map(i => (i, s"L$i")).toDF("k", "payload")
  private lazy val right = (4500L to 4700L).map(i => (i, s"R$i")).toDF("rk", "rv")

  test("prefilterAntiJoin equals the plain left-anti join") {
    val plain = left.join(right, col("k") === col("rk"), "left_anti")
      .select("k").as[Long].collect().sorted
    val fast = Bloom.prefilterAntiJoin(left, col("k"), right, col("rk"), 1000L)
      .select("k").as[Long].collect().sorted
    assert(fast.toSeq == plain.toSeq && fast.length == 4799)
  }

  test("prefilterFor keeps every true match and prunes most non-matches") {
    val kept = Bloom.prefilterFor(left, col("k"), right, col("rk"), 1000L, 0.01)
      .select("k").as[Long].collect().toSet
    assert((4500L to 4700L).forall(kept)) // no false negatives, ever
    // fpp 1% on 4799 non-matching keys → expect ~48 strays; 5x margin
    assert(kept.size <= 201 + 250, s"kept ${kept.size}")
  }

  test("empty right side: anti join keeps all, inner prefilter keeps none") {
    val none = right.filter(col("rk") < 0)
    assert(Bloom.prefilterAntiJoin(left, col("k"), none, col("rk"), 10L).count() == 5000)
    assert(Bloom.prefilterFor(left, col("k"), none, col("rk"), 10L).count() == 0)
  }
}
