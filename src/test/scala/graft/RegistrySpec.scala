package graft

/** The driver contract's internal consistency — cheap invariants that
  * turn silent registry drift into a red test:
  *  - an `oracleSql` key without a `queries` entry would never run (the
  *    driver iterates queries), so its oracle silently grades nothing;
  *  - a `benchQueries` name outside the registry is silently skipped by
  *    the bench's `.filter(all.contains)` guard;
  *  - the registry size is pinned so SURVEY §2.1's "N-query registry"
  *    claim cannot drift from HEAD unnoticed (the r14 verdict caught
  *    exactly that doc drift — update BOTH places when adding a query).
  */
class RegistrySpec extends SparkSpec {

  test("every oracle key has a runnable query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every bench name is a registry query") {
    val ghosts = SparkEntry.benchQueries.toSet -- SparkEntry.queries.keySet
    assert(ghosts.isEmpty, s"bench names outside the registry: $ghosts")
    assert(SparkEntry.benchQueries.distinct.size == SparkEntry.benchQueries.size,
      "duplicate bench names")
  }

  test("registry size matches the documented count") {
    assert(SparkEntry.queries.size == 269,
      s"registry has ${SparkEntry.queries.size} queries — update this pin " +
        "AND SURVEY §2.1 together")
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
