package graft.changelog

/** T1/T2: the change-event decoder (SURVEY §2) — one raw oplog entry →
  * 0..N normalized [[Change]]s. Pure Scala (no Spark types), used as a
  * `flatMap` over a `Dataset[RawOplog]` and unit-tested branch-by-branch
  * against the fixture table in FIXTURES.md §4.
  *
  * Branch map to the reference (`handleChange`, `mongo.go:157-454`):
  *  - insert `i`                    → `mongo.go:164-179`
  *  - update `u`, `$set`/`$unset`   → `mongo.go:192-212`
  *  - update `u`, `$v:2` diff       → `mongo.go:213-359` (s-sections
  *    `mongo.go:283-359`; the reference silently DROPS depth-3 nested `s`
  *    sections, `mongo.go:354-355` — we recurse fully, a documented fix)
  *  - update `u`, whole-doc replace → `mongo.go:369-385`
  *  - delete `d`                    → `mongo.go:394-419`
  *  - no-op `n`                     → `mongo.go:421-424`
  *  - tx `c` applyOps               → `mongo.go:426-451` (inner ops inherit
  *    the outer `ts`, `mongo.go:446`; non-replicated ns filtered,
  *    `mongo.go:434-438`)
  *  - any malformed shape           → DeadLetter (the reference calls
  *    `log.Fatalln`, e.g. `mongo.go:183,195,216,361,366` — aborting a
  *    1000-executor job on one bad record is not an option at scale)
  */
object OplogDecoder {

  /** Flatten a nested document into `_`-joined leaves (reference
    * `obj2plain`/`obj2add`, `mongo.go:141-155`). Keys are visited in sorted
    * order so collisions resolve deterministically (last-wins in sorted
    * order — the reference is nondeterministic map-order; divergence
    * documented in SURVEY §7). */
  def flattenDoc(doc: Map[String, Any], prefix: String = ""): Map[String, Any] =
    doc.toSeq.sortBy(_._1).foldLeft(Map.empty[String, Any]) { case (acc, (k, v)) =>
      // Dotted keys are Mongo's oplog wire form for nested updates
      // ($set: {"cfg.pub": 1}) — normalize them to the same `_`-joined
      // sink names nested documents flatten to (col4sql, mysql.go:54-56).
      val key = (if (prefix.isEmpty) k else s"${prefix}_$k").replace('.', '_')
      v match {
        case m: Map[_, _] => acc ++ flattenDoc(m.asInstanceOf[Map[String, Any]], key)
        case other        => acc + (key -> other)
      }
    }

  /** Extract the sink pk text (reference `mongo.go:399-405`,
    * `mysql.go:400-401` — the reference ABORTS on any non-ObjectID;
    * string pks pass through here as the established extension, and
    * integral pks render as their exact decimal text, which the
    * varchar pk column holds like any non-OID string). Doubles stay
    * dead-lettered: a float key has no canonical text. */
  private def idHex(v: Any): Either[String, String] = v match {
    case ObjectId(hex) => Right(hex)
    case s: String     => Right(s) // non-OID string PKs pass through
    case l: Long       => Right(l.toString)
    case i: Int        => Right(i.toString)
    case null          => Left("missing _id")
    case other         => Left(s"unsupported _id type: ${other.getClass.getSimpleName}")
  }

  def decode(entry: RawOplog, replicated: Set[String]): Seq[Change] = entry.op match {
    case "n" => Seq.empty // no-op heartbeat (mongo.go:421-424)

    case "c" => // multi-doc transaction: admin.$cmd applyOps (mongo.go:426-451)
      entry.o.get("applyOps") match {
        case Some(ops: Seq[_]) =>
          ops.flatMap {
            case m: Map[_, _] =>
              val im = m.asInstanceOf[Map[String, Any]]
              val inner = RawOplog(
                op = im.getOrElse("op", "?").toString,
                ns = im.getOrElse("ns", "").toString,
                ts = entry.ts, // inner ops inherit outer ts (mongo.go:446)
                o  = im.get("o").collect { case mm: Map[_, _] => mm.asInstanceOf[Map[String, Any]] }.getOrElse(Map.empty),
                o2 = im.get("o2").collect { case mm: Map[_, _] => mm.asInstanceOf[Map[String, Any]] })
              if (replicated.contains(inner.ns)) decode(inner, replicated) else Seq.empty // F2 filter
            case other =>
              Seq(DeadLetter(entry.ns, entry.ts, "non-document applyOps element", String.valueOf(other)))
          }
        case _ => Seq(DeadLetter(entry.ns, entry.ts, "c-op without applyOps array", entry.o.toString))
      }

    case _ if !replicated.contains(entry.ns) => Seq.empty // F2 (mongo.go:434-438 / pushed F1)

    case "i" => // insert: o is the full document (mongo.go:164-179)
      idHex(entry.o.getOrElse("_id", null)) match {
        case Left(err) => Seq(DeadLetter(table(entry.ns), entry.ts, err, entry.o.toString))
        case Right(id) =>
          Seq(Upsert(table(entry.ns), entry.ts, id, flattenDoc(entry.o - "_id"), partial = false))
      }

    case "u" =>
      val tbl = table(entry.ns)
      idHex(entry.o2.flatMap(_.get("_id")).orNull) match {
        case Left(err) => Seq(DeadLetter(tbl, entry.ts, err, entry.o.toString))
        case Right(id) =>
          if (entry.o.contains("$set") || entry.o.contains("$unset")) {
            // classic $set form (mongo.go:192-212)
            (entry.o.get("$set"), entry.o.get("$unset")) match {
              case (Some(s), _) if !s.isInstanceOf[Map[_, _]] =>
                Seq(DeadLetter(tbl, entry.ts, "non-document $set", String.valueOf(s)))
              case (setOpt, unsetOpt) =>
                val sets = setOpt.collect { case m: Map[_, _] => flattenDoc(m.asInstanceOf[Map[String, Any]]) }.getOrElse(Map.empty)
                // $unset KEYS are the removal paths, already in Mongo's
                // dotted wire form ($unset: {"cfg.old": 1}); values are
                // ignored sentinels. Keep the dots — they are the
                // scalar-vs-subtree disambiguator (ChangeEvent doc).
                val unsets = unsetOpt.collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].keySet }.getOrElse(Set.empty[String])
                Seq(Upsert(tbl, entry.ts, id, sets, partial = true, removed = unsets))
            }
          } else if (entry.o.get("$v").exists(v => String.valueOf(v) == "2") && entry.o.contains("diff")) {
            // $v:2 diff form (mongo.go:213-359)
            entry.o("diff") match {
              case d: Map[_, _] =>
                val (fields, removed) = decodeDiff(d.asInstanceOf[Map[String, Any]], prefix = "")
                Seq(Upsert(tbl, entry.ts, id, fields, partial = true, removed = removed))
              case other => Seq(DeadLetter(tbl, entry.ts, "non-document $v:2 diff", String.valueOf(other)))
            }
          } else if (entry.o.keys.exists(_.startsWith("$"))) {
            // unknown operator form — reference aborts (mongo.go:366)
            Seq(DeadLetter(tbl, entry.ts, s"unknown update form: ${entry.o.keys.filter(_.startsWith("$")).mkString(",")}", entry.o.toString))
          } else {
            // whole-document replace (mongo.go:369-385): full image
            Seq(Upsert(tbl, entry.ts, id, flattenDoc(entry.o - "_id"), partial = false))
          }
      }

    case "d" => // delete (mongo.go:394-419)
      idHex(entry.o.getOrElse("_id", null)) match {
        case Left(err) => Seq(DeadLetter(table(entry.ns), entry.ts, err, entry.o.toString))
        case Right(id) => Seq(Delete(table(entry.ns), entry.ts, id))
      }

    case other =>
      Seq(DeadLetter(table(entry.ns), entry.ts, s"unknown op: $other", entry.o.toString))
  }

  /** `$v:2` diff sections: `i` inserted fields, `u` updated fields, `d`
    * deleted fields, `s<name>` a nested sub-document diff (recursed with the
    * `_`-joined prefix; unbounded depth, unlike `mongo.go:354-355`).
    *
    * ARRAY diffs are handled exactly like the reference (`mongo.go:283-
    * 359`): the `a:true` marker and `u<index>` element updates fall to
    * the ignore arm, and an array's `s<index>` member section recurses
    * as if it were a subdocument named by its index (`field_0_…`) —
    * the reference recurses s-sections unconditionally too. Whole-array
    * updates arrive as plain `u` fields and replicate; element-level
    * array edits are outside both decoders' contract. */
  private def decodeDiff(diff: Map[String, Any], prefix: String): (Map[String, Any], Set[String]) = {
    var fields = Map.empty[String, Any]
    var removed = Set.empty[String]
    // The recursion prefix is DOTTED (source-path form). `fields` still
    // flatten to `_`-joined sink names — flattenDoc dot→underscore
    // normalization applies to the whole joined key, so a dotted prefix
    // yields identical sink names. `removed` keeps the dots: removal
    // paths must stay structural (ChangeEvent doc).
    def pfx(k: String) = if (prefix.isEmpty) k else s"$prefix.$k"
    diff.toSeq.sortBy(_._1).foreach {
      case ("i", m: Map[_, _]) =>
        fields ++= flattenDoc(m.asInstanceOf[Map[String, Any]], prefix)
      case ("u", m: Map[_, _]) =>
        fields ++= flattenDoc(m.asInstanceOf[Map[String, Any]], prefix)
      case ("d", m: Map[_, _]) =>
        removed ++= m.asInstanceOf[Map[String, Any]].keySet.map(pfx)
      case (k, m: Map[_, _]) if k.startsWith("s") && k.length > 1 =>
        val (f, r) = decodeDiff(m.asInstanceOf[Map[String, Any]], pfx(k.drop(1)))
        fields ++= f; removed ++= r
      case _ => // a/o array-diff markers etc.: ignored, matching the reference's skip
    }
    (fields, removed)
  }

  private def table(ns: String): String = ns.split('.').drop(1).mkString(".")

  /** Pack/unpack the oplog position: `uint64(T)<<32 | I`
    * (reference `mongo.go:171,613`, decode `mongo.go:485-489`). */
  def packTs(t: Long, i: Long): Long = (t << 32) | (i & 0xffffffffL)
  def unpackTs(ts: Long): (Long, Long) = (ts >>> 32, ts & 0xffffffffL)
}
