package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Algebraic laws of the quality gates, checked on generated frames.
  * Case counts are small (each case runs Spark jobs); the laws cover the
  * merge/one-shot equivalence, TV-distance bounds, and the diff
  * partition property that unit fixtures can only spot-check. */
class QualityPropertySpec extends SparkSpec {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)

  private val valueGen: Gen[Option[Double]] = Gen.frequency(
    5 -> Gen.chooseNum(-1e6, 1e6).map(v => Some(math.rint(v * 100) / 100)),
    1 -> Gen.const(Option.empty[Double]))

  test("LAW: merge of sharded partials == one-shot profile, any sharding") {
    import spark.implicits._
    val rows = Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 5L), valueGen))
    val prop = forAll(rows) { data =>
      val df = data.toDF("shard", "a")
      Quality.mergeProfiles(Quality.numericProfileSharded(df, "shard", Seq("a")))
        .collect().toSeq ==
        Quality.numericProfile(df, Seq("a")).collect().toSeq
    }
    assert(SCTest.check(params, prop).passed)
  }

  test("LAW: TV contributions are non-negative and sum into [0, 1]") {
    import spark.implicits._
    val side = Gen.nonEmptyListOf(Gen.chooseNum(-50.0, 150.0)) // incl. out-of-range
    val prop = forAll(Gen.zip(side, side)) { case (b, a) =>
      val rows = Quality.histogramDrift(
          b.toDF("v"), a.toDF("v"), "v", lo = 0.0, hi = 100.0, bins = 8)
        .collect().map(r => (r.getInt(0), r.getDouble(3)))
      val tv = rows.map(_._2).sum
      rows.forall { case (bin, c) => c >= 0.0 && bin >= 0 && bin < 8 } &&
        tv >= 0.0 && tv <= 1.0 + 1e-4 // 6-dp per-bin rounding slack
    }
    assert(SCTest.check(params, prop).passed)
  }

  test("LAW: corpusDiff statuses partition old-union-new ids") {
    import spark.implicits._
    val snap = Gen.listOf(Gen.zip(Gen.chooseNum(0L, 20L),
      Gen.oneOf("x", "y", "z").map(Option(_))))
      .map(_.distinctBy(_._1))
    val prop = forAll(Gen.zip(snap, snap)) { case (o, n) =>
      if (o.isEmpty && n.isEmpty) true
      else {
        val got = Quality.corpusDiff(
            o.toDF("doc_id", "text"), n.toDF("doc_id", "text"),
            "doc_id", "text")
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        val om = o.toMap; val nm = n.toMap
        got.keySet == (om.keySet ++ nm.keySet) && got.forall { case (id, st) =>
          (om.contains(id), nm.contains(id)) match {
            case (false, true) => st == "added"
            case (true, false) => st == "removed"
            case (true, true)  =>
              if (om(id) == nm(id)) st == "unchanged" else st == "changed"
            case _             => false
          }
        }
      }
    }
    assert(SCTest.check(params, prop).passed)
  }
}
