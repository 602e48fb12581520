package graft.changelog

import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** Branch-by-branch coverage of the T1/T2 decoder against the reference's
  * handleChange (mongo.go:157-454) — the fixture table from FIXTURES.md §4.
  */
class OplogDecoderSpec extends AnyFunSuite {

  val ns = "app.users"
  val replicated = Set("app.users", "app.orders")
  val oid = ObjectId("0123456789abcdef01234567")
  def raw(op: String, o: Map[String, Any], o2: Option[Map[String, Any]] = None) =
    RawOplog(op, ns, ts = 7L, o = o, o2 = o2)

  test("insert: full flattened image, partial=false (mongo.go:164-179)") {
    val out = OplogDecoder.decode(
      raw("i", Map("_id" -> oid, "name" -> "x", "cfg" -> Map("pub" -> 1))), replicated)
    assert(out == Seq(Upsert("users", 7L, oid.hex,
      Map("name" -> "x", "cfg_pub" -> 1), partial = false)))
  }

  test("update $set/$unset: partial image + removed set (mongo.go:192-212)") {
    val out = OplogDecoder.decode(
      raw("u", Map("$set" -> Map("a" -> 1, "n" -> Map("b" -> 2)), "$unset" -> Map("z" -> 1)),
        Some(Map("_id" -> oid))), replicated)
    assert(out == Seq(Upsert("users", 7L, oid.hex,
      Map("a" -> 1, "n_b" -> 2), partial = true, removed = Set("z"))))
  }

  test("update $v:2 diff: i/u/d sections + nested s-sections (mongo.go:213-359)") {
    val diff = Map(
      "i" -> Map("new" -> 9),
      "u" -> Map("upd" -> 8),
      "d" -> Map("gone" -> true),
      "scfg" -> Map("u" -> Map("pub" -> 0), "d" -> Map("old" -> true),
        "sdeep" -> Map("u" -> Map("leaf" -> 5))))
    val out = OplogDecoder.decode(
      raw("u", Map("$v" -> 2, "diff" -> diff), Some(Map("_id" -> oid))), replicated)
    assert(out == Seq(Upsert("users", 7L, oid.hex,
      Map("new" -> 9, "upd" -> 8, "cfg_pub" -> 0, "cfg_deep_leaf" -> 5),
      // removal paths stay DOTTED (source form): the apply side needs
      // the structure to expand subtree unsets without corrupting
      // underscore-named scalar siblings (ADVICE r15)
      partial = true, removed = Set("gone", "cfg.old"))))
  }

  test("dotted $set paths normalize to _-joined sink names; $unset paths keep dots") {
    val out = OplogDecoder.decode(
      raw("u", Map("$set" -> Map("cfg.pub" -> 1), "$unset" -> Map("cfg.old" -> 1)),
        Some(Map("_id" -> oid))), replicated)
    assert(out == Seq(Upsert("users", 7L, oid.hex,
      Map("cfg_pub" -> 1), partial = true, removed = Set("cfg.old"))))
  }

  test("scalar-vs-subtree unset disambiguation survives decode (ADVICE r15)") {
    // distinct top-level fields `status` (scalar) and `status_code`: an
    // unset of `status` must NOT be conflatable with a subtree covering
    // status_code — dotted paths make ancestry checkable downstream
    val out = OplogDecoder.decode(
      raw("u", Map("$unset" -> Map("status" -> 1)), Some(Map("_id" -> oid))), replicated)
    assert(out == Seq(Upsert("users", 7L, oid.hex,
      Map.empty, partial = true, removed = Set("status"))))
    // "status" covers sourceName "status" and "status.x" but never
    // "status_code" under the dotted-ancestor rule applied at the sink
  }

  test("update whole-document replace: full image, partial=false (mongo.go:369-385)") {
    val out = OplogDecoder.decode(
      raw("u", Map("_id" -> oid, "name" -> "y"), Some(Map("_id" -> oid))), replicated)
    assert(out == Seq(Upsert("users", 7L, oid.hex, Map("name" -> "y"), partial = false)))
  }

  test("delete emits Delete keyed by hex id (mongo.go:394-419)") {
    assert(OplogDecoder.decode(raw("d", Map("_id" -> oid)), replicated) ==
      Seq(Delete("users", 7L, oid.hex)))
  }

  test("no-op and non-replicated namespaces are dropped (mongo.go:421-424, F2)") {
    assert(OplogDecoder.decode(raw("n", Map("msg" -> "hb")), replicated).isEmpty)
    assert(OplogDecoder.decode(
      RawOplog("i", "app.ignored", 7L, Map("_id" -> oid)), replicated).isEmpty)
  }

  test("applyOps tx unwraps, inner ops inherit outer ts, inner filter applies (mongo.go:426-451)") {
    val tx = RawOplog("c", "admin.$cmd", ts = 99L, o = Map("applyOps" -> Seq(
      Map("op" -> "i", "ns" -> "app.users", "o" -> Map("_id" -> oid, "v" -> 1)),
      Map("op" -> "d", "ns" -> "app.orders", "o" -> Map("_id" -> oid)),
      Map("op" -> "i", "ns" -> "app.not_replicated", "o" -> Map("_id" -> oid)))))
    val out = OplogDecoder.decode(tx, replicated)
    assert(out == Seq(
      Upsert("users", 99L, oid.hex, Map("v" -> 1), partial = false),
      Delete("orders", 99L, oid.hex)))
  }

  test("malformed shapes dead-letter instead of aborting (vs mongo.go log.Fatalln)") {
    val badSet = OplogDecoder.decode(
      raw("u", Map("$set" -> "not-a-doc"), Some(Map("_id" -> oid))), replicated)
    assert(badSet.head.isInstanceOf[DeadLetter])
    val noId = OplogDecoder.decode(raw("i", Map("x" -> 1)), replicated)
    assert(noId.head.isInstanceOf[DeadLetter])
    val unknownOp = OplogDecoder.decode(raw("z", Map()), replicated)
    assert(unknownOp.head.isInstanceOf[DeadLetter])
    val badCmd = OplogDecoder.decode(
      RawOplog("c", "admin.$cmd", 7L, Map("noApplyOps" -> 1)), replicated)
    assert(badCmd.head.isInstanceOf[DeadLetter])
  }

  test("flattenDoc joins nested paths with _ and resolves collisions deterministically") {
    assert(OplogDecoder.flattenDoc(Map("a" -> Map("b" -> Map("c" -> 1)), "x" -> 2)) ==
      Map("a_b_c" -> 1, "x" -> 2))
    // collision: literal "a_b" vs nested a.b — sorted-key order makes the
    // outcome deterministic (last-wins in sorted order)
    val collided = OplogDecoder.flattenDoc(Map("a_b" -> 1, "a" -> Map("b" -> 2)))
    assert(collided == Map("a_b" -> 1)) // "a" sorts before "a_b"; later key wins
  }

  test("oplog position packs as T<<32|I and round-trips (mongo.go:171,613)") {
    val prop = forAll { (t: Int, i: Int) =>
      val (tt, ii) = (t.toLong & 0xffffffffL, i.toLong & 0xffffffffL)
      OplogDecoder.unpackTs(OplogDecoder.packTs(tt, ii)) == ((tt, ii))
    }
    assert(check(Parameters.default, prop).passed)
    assert(OplogDecoder.packTs(1700000000L, 5L) == (1700000000L << 32 | 5L))
  }
}
