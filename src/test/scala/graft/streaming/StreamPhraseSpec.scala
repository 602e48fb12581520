package graft.streaming

import graft.SparkSpec

/** The ingest-time phrase stream must be batch-equivalent: same
  * phrases, same committed positional index, same occurrence assembly
  * as [[graft.operators.Retrieval.phraseTopK]] over the full set — the
  * graded contract (the registry row shares the inline oracle). The
  * equivalence holds because the index is frozen for the run and each
  * phrase ranks independently, so batching the phrase set is pure
  * partitioning. */
class StreamPhraseSpec extends SparkSpec {

  test("streaming phrase probe ≡ one-shot phraseTopK over the full phrase set, row for row") {
    // corpus-vocabulary phrases (the registry's PhraseQueries shape) so
    // matches are non-empty at sf0.001, incl. the repeated-term stress
    val phrases = Seq((1, "table part"), (2, "window agg"),
      (3, "table table"), (4, "key agg row"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3))
    val got = StreamPipeline
      .streamingPhraseTopK(spark, Sf0001, phrases, k = 10)
      .collect().map(key).toSet
    val want = graft.operators.Retrieval.phraseTopK(
        graft.Tables.load(spark, Sf0001, "documents"),
        "doc_id", "text", phrases, 10)
      .collect().map(key).toSet
    assert(got == want, s"diff: ${(got -- want).take(3)} / ${(want -- got).take(3)}")
    assert(got.nonEmpty)
    // 4 phrases round-robin into 3 staged files: every trigger carried
    // at least one phrase; at sf0.001 the trigram has exactly one hit
    // and the rest are common, so all four query ids surface
    assert(got.map(_._1) == phrases.map(_._1).toSet)
  }

  test("streaming phrase screen ≡ one-shot phraseScreen: ALL hits, unranked") {
    val phrases = Seq((1, "table part"), (2, "table table"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getInt(0), r.getLong(1), r.getLong(2))
    val got = StreamPipeline
      .streamingPhraseScreen(spark, Sf0001, phrases)
      .collect().map(key).toSet
    val docs = graft.Tables.load(spark, Sf0001, "documents")
    val want = graft.operators.Retrieval
      .phraseScreen(docs, "doc_id", "text", phrases)
      .collect().map(key).toSet
    assert(got == want, s"diff: ${(got -- want).take(3)} / ${(want -- got).take(3)}")
    // the screen is unbounded: more hit docs than any top-k would keep
    // (sf0.001 has ~25 docs matching "table part")
    assert(got.count(_._1 == 1) > 10)
    // and it agrees with the ranked probe's frequencies at k = ∞
    val ranked = graft.operators.Retrieval
      .phraseTopK(docs, "doc_id", "text", phrases, k = 100000)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == ranked)
  }
}
