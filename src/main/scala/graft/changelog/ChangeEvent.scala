package graft.changelog

/** Typed change-event model (SURVEY §1.1) — the Spark-side equivalent of
  * the reference's `Op{cmd, arg}` / `Ops` (reference `mongo.go:49-56`).
  *
  * `ts` is the packed oplog position `uint64(T)<<32 | I`
  * (`mongo.go:171,613`) — a single Long offset. `fields` carries flattened
  * (`_`-joined) leaf values as strings for schema-free transport; typed
  * casting happens at projection (Transforms.projectTo).
  */
sealed trait Change {
  def table: String
  def ts: Long
}

/** Insert or full/partial update. `partial = true` ⇒ only the named fields
  * change (a `$set`/`$v:2` diff, `mongo.go:192-359`); untouched sink columns
  * must be preserved. `partial = false` ⇒ full image (insert
  * `mongo.go:164-179` or whole-doc replace `mongo.go:369-385`): absent
  * declared columns become NULL. `removed` lists fields explicitly unset
  * (`$unset` / `$v:2` `d` section, `mongo.go:246-258`) as DOTTED source
  * paths — NOT flattened sink names. The dot structure is the
  * disambiguator the apply side needs: a removed path nulls a declared
  * column iff it equals the column's dotted `sourceName` or is a dotted
  * ANCESTOR of it (`$unset: {cfg: 1}` on a subdoc nulls `cfg.pub` →
  * sink `cfg_pub`), while a scalar field that merely shares a flattened
  * PREFIX (source field `status_code` vs `$unset` of scalar `status`)
  * stays untouched — under flattened names those two cases collide. */
final case class Upsert(
    table: String,
    ts: Long,
    id: String,
    fields: Map[String, Any],
    partial: Boolean,
    removed: Set[String] = Set.empty) extends Change

/** Delete by primary key (reference `mongo.go:394-419`). */
final case class Delete(table: String, ts: Long, id: String) extends Change

/** Anything the reference would `log.Fatalln` on (`mongo.go:183,195,216,
  * 361,366`) — we route to a dead-letter record instead (SURVEY §2 T1). */
final case class DeadLetter(table: String, ts: Long, reason: String, raw: String) extends Change

/** One raw oplog entry, decoded from the source (reference `OpLog`,
  * `mongo.go:121-127`): `op` ∈ i|u|d|n|c, `ns` = "db.collection", `o` the
  * operation document, `o2` the row selector on updates. Values are plain
  * Scala: Map[String,Any] / Seq[Any] / ObjectId / primitives / null. */
final case class RawOplog(
    op: String,
    ns: String,
    ts: Long,
    o: Map[String, Any],
    o2: Option[Map[String, Any]] = None)

/** 12-byte Mongo ObjectID surrogate; carried as its 24-char lowercase hex
  * form everywhere downstream (reference `mysql.go:400-401`). */
final case class ObjectId(hex: String) {
  require(hex.length == 24, s"ObjectId must be 24 hex chars, got: $hex")
}
