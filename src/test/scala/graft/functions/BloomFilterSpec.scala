package graft.functions

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private val bits = 1024
  private val hashes = 4

  test("no false negatives: every inserted key probes true") {
    val bloom = udaf(new BloomFilter(bits, hashes))
    val keys = (1 to 200).map(i => s"k$i").toDF("k")
      .select(col("k"), TextAnalysis.tokenHash60(col("k")).as("h"))
    val sketch = keys.agg(bloom(col("h")).as("bf"))
    val misses = keys.crossJoin(broadcast(sketch))
      .filter(!BloomFilter.mightContain(col("bf"), col("h"), bits, hashes))
      .count()
    assert(misses == 0L)
  }

  test("absent keys mostly probe false (the filter actually filters)") {
    val bloom = udaf(new BloomFilter(bits, hashes))
    val in = (1 to 50).map(i => s"in$i").toDF("k")
      .select(TextAnalysis.tokenHash60(col("k")).as("h"))
    val sketch = in.agg(bloom(col("h")).as("bf"))
    val out = (1 to 500).map(i => s"out$i").toDF("k")
      .select(TextAnalysis.tokenHash60(col("k")).as("h"))
    val fp = out.crossJoin(broadcast(sketch))
      .filter(BloomFilter.mightContain(col("bf"), col("h"), bits, hashes))
      .count()
    assert(fp < 50, s"false-positive rate implausibly high: $fp/500")
  }

  test("prunedJoin returns exactly the plain join") {
    val large = (1 to 1000).map(i => (i.toLong % 100, i)).toDF("k", "v")
    val small = Seq((3L, "a"), (7L, "b"), (7L, "b2"), (999L, "z")).toDF("k", "name")
    val plain = large.join(small, "k").orderBy("k", "v", "name").collect().toSeq
    val pruned = BloomFilter.prunedJoin(large, small, "k", numBits = 1024)
      .orderBy("k", "v", "name").collect().toSeq
    assert(pruned == plain)
  }

  test("prunedJoin rejects a reserved __bloom input column") {
    val large = Seq((1L, 0)).toDF("k", "__bloom")
    val small = Seq((1L, "a")).toDF("k", "name")
    val e = intercept[IllegalArgumentException] {
      BloomFilter.prunedJoin(large, small, "k", numBits = 1024)
    }
    assert(e.getMessage.contains("__bloom"))
  }

  test("negative digests (signed xxhash64) keep the no-false-negative guarantee") {
    val bloom = udaf(new BloomFilter(bits, hashes))
    val keys = (1 to 100).map(i => s"k$i").toDF("k")
      .select(col("k"), xxhash64(col("k")).as("h")) // signed: ~half negative
    val sketch = keys.agg(bloom(col("h")).as("bf"))
    val misses = keys.crossJoin(broadcast(sketch))
      .filter(!BloomFilter.mightContain(col("bf"), col("h"), bits, hashes))
      .count()
    assert(misses == 0L)
  }

  test("JVM bitOf and in-query probe use the same hash family") {
    val h = 987654321L
    val bloom = udaf(new BloomFilter(bits, hashes))
    val sk = Seq(h).toDF("h").agg(bloom(col("h"))).as[Seq[Long]].head()
    (0 until hashes).foreach { i =>
      val bit = BloomFilter.bitOf(h, i, bits)
      assert((sk(bit >>> 6) >>> (bit & 63) & 1L) == 1L)
    }
  }

  test("merge is order-independent: 1 partition ≡ 16 partitions") {
    val bloom = udaf(new BloomFilter(bits, hashes))
    def sk(parts: Int) = (1 to 300).map(i => s"k$i").toDF("k")
      .repartition(parts)
      .select(TextAnalysis.tokenHash60(col("k")).as("h"))
      .agg(bloom(col("h"))).as[Seq[Long]].head()
    assert(sk(1) == sk(16))
  }
}
