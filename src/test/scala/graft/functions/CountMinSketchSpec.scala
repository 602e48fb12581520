package graft.functions

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class CountMinSketchSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 64

  private def keys: Seq[String] =
    (1 to 40).flatMap(i => Seq.fill(i % 7 + 1)(s"key$i"))

  test("estimates never under-count and respect the collision bound") {
    val cms = udaf(new CountMinSketch(depth, width))
    val df = keys.toDF("k").select(col("k"),
      TextAnalysis.tokenHash60(col("k")).as("h"))
    val sketch = df.agg(cms(col("h")).as("cms"), count(lit(1)).as("n"))
    val checked = df.groupBy("k").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sketch))
      .withColumn("est",
        CountMinSketch.estimate(col("cms"), TextAnalysis.tokenHash60(col("k")), depth, width))
    val rows = checked.select("k", "exact", "est", "n")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, exact, est, n) =>
      assert(est >= exact, s"$k under-counted: $est < $exact")
      assert(est <= exact + 4L * n / width + 1,
        s"$k over-counted beyond the bound: $est vs $exact (n=$n)")
    }
  }

  test("merge is order-independent: 1 partition ≡ 16 partitions") {
    val cms = udaf(new CountMinSketch(depth, width))
    def sk(parts: Int) = keys.toDF("k")
      .repartition(parts)
      .select(TextAnalysis.tokenHash60(col("k")).as("h"))
      .agg(cms(col("h"))).as[Seq[Long]].head()
    assert(sk(1) == sk(16))
  }

  test("total mass per row equals the input count") {
    val cms = udaf(new CountMinSketch(depth, width))
    val sk = keys.toDF("k")
      .select(TextAnalysis.tokenHash60(col("k")).as("h"))
      .agg(cms(col("h"))).as[Seq[Long]].head()
    (0 until depth).foreach { i =>
      assert(sk.slice(i * width, (i + 1) * width).sum == keys.size.toLong)
    }
  }

  test("negative digests (signed xxhash64) never under-count") {
    val cms = udaf(new CountMinSketch(depth, width))
    val df = keys.toDF("k").select(col("k"), xxhash64(col("k")).as("h"))
    val sketch = df.agg(cms(col("h")).as("cms"))
    val bad = df.groupBy("k").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sketch))
      .withColumn("est",
        CountMinSketch.estimate(col("cms"), xxhash64(col("k")), depth, width))
      .filter(col("est") < col("exact"))
      .count()
    assert(bad == 0L)
  }

  test("JVM slot and in-query estimate use the same hash family") {
    val h = 123456789L
    val cms = udaf(new CountMinSketch(depth, width))
    val sk = Seq(h).toDF("h").agg(cms(col("h"))).as[Seq[Long]].head()
    (0 until depth).foreach { i =>
      assert(sk(i * width + CountMinSketch.slot(h, i, width)) == 1L)
    }
  }
}
