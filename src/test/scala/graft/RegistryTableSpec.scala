package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the checked-in SURVEY §2.1 artifact (SURVEY_REGISTRY.md) to the
  * LIVE registry: the table is generated, not hand-maintained, so a
  * registry change without `sbt "runMain graft.tools.RegistryTable"`
  * fails here with the drift made visible. Content-pinning, not just
  * the count (the hand-kept table drifted twice, r17/r18). */
class RegistryTableSpec extends AnyFunSuite {

  test("SURVEY_REGISTRY.md matches the live registry byte-for-byte") {
    val path = java.nio.file.Paths.get("SURVEY_REGISTRY.md")
    assert(java.nio.file.Files.exists(path),
      "SURVEY_REGISTRY.md missing — run: sbt \"runMain graft.tools.RegistryTable\"")
    val onDisk = new String(java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8)
    val live = graft.tools.RegistryTable.render()
    assert(onDisk == live,
      "SURVEY_REGISTRY.md is stale — regenerate with: " +
        "sbt \"runMain graft.tools.RegistryTable\"")
  }

  test("every registry key lands in a named family (no silent 'other' growth)") {
    val other = graft.SparkEntry.queries.keys
      .filter(k => graft.tools.RegistryTable.family(k) == "analytics / core SQL")
    // the analytics bucket is the catch-all; it must hold only the core
    // SQL surface, not misfiled operator families — pin its size so a
    // new prefix drifting in shows up as a failed count
    assert(other.size <= 60, s"catch-all bucket grew to ${other.size}: " +
      other.toSeq.sorted.mkString(", "))
  }
}
