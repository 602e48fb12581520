package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinningSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$Sf0001/documents.parquet")

  test("sketch edges are EXACT below accuracy: value at rank ceil(p*n)") {
    val got = Binning.quantileEdges(docs, "n_chars", "lang", 10)
      .as[(String, Array[Long])].collect().toMap
    val byLang = docs.select($"lang", $"n_chars").as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((lang, sorted) <- byLang) {
      val n = sorted.length
      val want = Binning.probs(10).map(p =>
        sorted(math.ceil(p * n).toInt - 1)).toArray
      assert(got(lang).sameElements(want),
        s"$lang: ${got(lang).mkString(",")} vs ${want.mkString(",")}")
    }
  }

  test("bins partition every row; bin value ranges are disjoint and ordered") {
    val binned = Binning.quantileBins(docs, "n_chars", "lang", 10)
    assert(binned.count() == docs.count())
    val ranges = binned.groupBy($"lang", $"bin")
      .agg(min($"n_chars").as("lo"), max($"n_chars").as("hi"))
      .as[(String, Int, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for ((lang, bins) <- ranges; w <- bins.sliding(2) if w.length == 2) {
      val (a, b) = (w(0), w(1))
      assert(a._4 < b._3, s"$lang: bin ${a._2} hi ${a._4} overlaps bin ${b._2} lo ${b._3}")
    }
  }

  test("distinct values, n divisible by numBins: sketch bins == exact ntile bins") {
    // ranks align with edge ranks k*n/bins exactly, so the two contracts
    // agree — the small-sf cross-check the production operator is pinned by
    // i*13 mod 2003 is injective for i < 2003 (13 invertible mod the prime)
    val df = (1 to 200).map(i => (i.toLong, (i * 13) % 2003)).toDF("id", "v")
    assert(df.select($"v").distinct().count() == 200) // precondition
    val withStratum = df.withColumn("g", lit("all"))
    val a = Binning.quantileBins(withStratum, "v", "g", 10)
      .select($"id", $"bin").as[(Long, Int)].collect().toMap
    val b = Binning.ntileBins(withStratum, "v", "g", 10, $"id")
      .select($"id", $"bin").as[(Long, Int)].collect().toMap
    assert(a == b)
  }

  test("null values get a null bin") {
    val df = Seq(("a", Some(1)), ("a", Some(2)), ("a", Option.empty[Int]))
      .toDF("g", "v")
    val bins = Binning.quantileBins(df, "v", "g", 2)
      .select($"v", $"bin").as[(Option[Int], Option[Int])].collect().toMap
    assert(bins(None).isEmpty)
    assert(bins(Some(1)).nonEmpty && bins(Some(2)).nonEmpty)
  }

  test("null strata keep their rows with a null bin (left join, never dropped)") {
    val df = Seq((Some("a"), 1), (Some("a"), 2), (None, 3), (None, 4))
      .toDF("g", "v")
    val binned = Binning.quantileBins(df, "v", "g", 2)
    assert(binned.count() == 4, "a null stratum must not drop rows")
    val nullStratum = binned.filter($"g".isNull)
      .select($"v", $"bin").as[(Int, Option[Int])].collect().toMap
    assert(nullStratum.keySet == Set(3, 4))
    assert(nullStratum.values.forall(_.isEmpty),
      "null-stratum rows get a null bin (NULL never equi-matches its edges)")
    // non-null strata still binned normally
    assert(binned.filter($"g" === "a" && $"bin".isNotNull).count() == 2)
  }

  test("plan: no window, no per-stratum sort — sketch aggregate + broadcast join") {
    val plan = Binning.quantileBins(docs, "n_chars", "lang", 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "sketch path must not plan a window")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "edges must arrive by broadcast, not a shuffle join")
    // the ntile twin, by contrast, IS the per-stratum sort we're avoiding
    val exact = Binning.ntileBins(docs, "n_chars", "lang", 10, col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(exact.contains("Window"))
  }

  test("reserved/duplicate column guards") {
    val df = Seq(("a", 1)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Binning.quantileBins(df.withColumn("__edges", lit(1)), "v", "g", 2)
    }
    intercept[IllegalArgumentException] {
      Binning.quantileBins(df.withColumn("bin", lit(1)), "v", "g", 2)
    }
  }
}
