package graft.queries

import graft.Tables
import graft.config.{ColumnSpec, MappingConfig, TableSpec}
import graft.operators.Transforms
import graft.sink.{MergeApply, SchemaSync}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2 reference operators (S/F/P/T/J/W/O/D families) expressed as
  * oracle-checkable queries over the driver's parquet test tables. Each
  * query's DuckDB twin lives in [[CdcQueries.oracles]] — aliases must stay
  * identical on both sides (the driver sorts columns by name before
  * hashing).
  *
  * `events` plays the role of the change feed: `ts` (ns → µs via
  * `div 1000`, matching DuckDB `epoch_us`), `user_id` the document key,
  * `event_type` mapped onto insert/update/delete ops.
  */
object CdcQueries {

  private def q(f: (SparkSession, String) => DataFrame) = f

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S1+P1+P3: full snapshot scan projected to a declared schema with
    // NULL-fill for an undeclared source column (reference mysql.go:381-407).
    "s1_snapshot_project" -> q { (s, dir) =>
      val spec = TableSpec("orders", Seq(
        ColumnSpec("o_custkey", "bigint(20)"),
        ColumnSpec("o_orderstatus", "varchar(1)"),
        ColumnSpec("o_totalprice", "double"),
        ColumnSpec("o_orderpriority", "varchar(15)"),
        ColumnSpec("loyalty_tier", "int")))   // not in source → NULL-fill
      val src = Tables.load(s, dir, "orders")
        .withColumn("_id", col("o_orderkey").cast("string"))
      Transforms.projectTo(src, spec).orderBy("_id")
    },

    // S2+F1: change-feed scan with the pushed-down predicate
    // (ns ∈ replicated set AND ts > checkpoint, reference mongo.go:462-492).
    "s2_changefeed_scan" -> q { (s, dir) =>
      val ckptUs = 1704412800000000L // 2024-01-05T00:00:00Z
      // Filter on the RAW ts column so the predicate pushes into the
      // parquet scan (row-group pruning at 100 TB); `ts div 1000 > ckptUs`
      // ⟺ `ts >= (ckptUs+1)*1000` for integer nanos.
      Tables.load(s, dir, "events")
        .filter(col("event_type").isin("signup", "purchase", "error") &&
          col("ts") >= lit((ckptUs + 1) * 1000L))
        .select(col("event_id"), expr("ts div 1000").as("ts_us"),
          col("user_id"), col("event_type"))
        .orderBy("event_id")
    },

    // S4: key-projection scan of the sink (scanTableIds, mysql.go:590-604)
    // — column pruning reaches the parquet scan (ReadSchema = 1 column).
    "s4_key_scan" -> q { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey").as("_id")).orderBy("_id")
    },

    // F3: config-membership guard — only configured tables/kinds pass
    // (mysql.go:438-440): the filter set is DERIVED from a parsed config,
    // not hard-coded.
    "f3_config_guard" -> q { (s, dir) =>
      val cfg = graft.config.ConfigParser.parse(
        """inp: mongodb://src/app
          |out: mysql://dst/sink
          |tables:
          |  click:
          |    value: double
          |  purchase:
          |    value: double
          |""".stripMargin)
      val configured = cfg.tables.map(_.name)
      Tables.load(s, dir, "events")
        .filter(col("event_type").isin(configured: _*))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
        .orderBy("event_type")
    },

    // T1 as a distributed flatMap: every event becomes a RawOplog entry
    // (signup→insert, error→delete, else a $set partial update), decoded by
    // OplogDecoder per partition — the decoder itself runs on executors.
    "t1_decode_stream" -> q { (s, dir) =>
      import s.implicits._
      val replicated = Set("app.users")
      Tables.load(s, dir, "events")
        .select(col("event_id"), expr("ts div 1000").as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
        .as[(Long, Long, Long, String, Double)]
        .flatMap { case (eventId, tsUs, userId, eventType, value) =>
          val id = userId.toString
          val entry = eventType match {
            case "signup" => graft.changelog.RawOplog("i", "app.users", tsUs,
              Map("_id" -> id, "balance" -> value))
            case "error" => graft.changelog.RawOplog("d", "app.users", tsUs,
              Map("_id" -> id))
            case _ => graft.changelog.RawOplog("u", "app.users", tsUs,
              Map("$set" -> Map("balance" -> value)), Some(Map("_id" -> id)))
          }
          graft.changelog.OplogDecoder.decode(entry, replicated).map {
            case graft.changelog.Upsert(tbl, ts, docId, fields, partial, _) =>
              (eventId, tbl, ts, docId, "upsert", partial,
                fields.get("balance").map(_.asInstanceOf[Double]))
            case graft.changelog.Delete(tbl, ts, docId) =>
              (eventId, tbl, ts, docId, "delete", false, None: Option[Double])
            case other =>
              (eventId, other.table, other.ts, "?", "dead_letter", false,
                None: Option[Double])
          }
        }
        .toDF("event_id", "tbl", "ts_us", "id", "kind", "partial", "balance")
        .orderBy("event_id")
    },

    // T2: applyOps transaction unwrap (mongo.go:426-451) — each selected
    // user's events become ONE admin.$cmd applyOps entry whose inner ops
    // carry no ts of their own; the decoder must unwrap them, inherit the
    // OUTER ts, and emit a deterministic per-entry seq. The oracle computes
    // the expected unwrap directly from events, so ts inheritance and seq
    // ordering are hash-checked, not just unit-tested. Real applyOps
    // entries are bounded (16 MB document cap), so materializing one
    // transaction's ops in flatMapGroups is safe at any corpus size.
    "t2_tx_unwrap" -> q { (s, dir) =>
      import s.implicits._
      val replicated = Set("app.users")
      Tables.load(s, dir, "events")
        .filter(col("user_id") % 50 === 0)
        .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"),
          col("event_type"), col("value"))
        .as[(Long, Long, Long, String, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (uid, it) =>
          val evs = it.toSeq.sortBy(_._2)
          val innerOps: Seq[Any] = evs.map { case (_, _, _, tpe, value) =>
            tpe match {
              case "signup" => Map("op" -> "i", "ns" -> "app.users",
                "o" -> Map("_id" -> uid.toString, "balance" -> value))
              case "error" => Map("op" -> "d", "ns" -> "app.users",
                "o" -> Map("_id" -> uid.toString))
              case _ => Map("op" -> "u", "ns" -> "app.users",
                "o" -> Map("$set" -> Map("balance" -> value)),
                "o2" -> Map("_id" -> uid.toString))
            }
          }
          val entry = graft.changelog.RawOplog("c", "admin.$cmd",
            ts = evs.map(_._3).max, o = Map("applyOps" -> innerOps))
          graft.changelog.OplogDecoder.decode(entry, replicated).zipWithIndex.map {
            case (graft.changelog.Upsert(_, ts, _, fields, partial, _), seq) =>
              (uid, seq, "upsert", ts, fields.get("balance").map(_.asInstanceOf[Double]), partial)
            case (graft.changelog.Delete(_, ts, _), seq) =>
              (uid, seq, "delete", ts, None: Option[Double], false)
            case (other, seq) =>
              (uid, seq, "dead_letter", other.ts, None: Option[Double], false)
          }
        }
        .toDF("user_id", "seq", "kind", "ts_us", "balance", "partial")
        .orderBy("user_id", "seq")
    },

    // S5: max-offset read — the system's one aggregation (mongo.go:595-616).
    "s5_max_offset" -> q { (s, dir) =>
      Tables.load(s, dir, "events")
        .agg(max(expr("ts div 1000")).as("max_ts_us"),
          count(lit(1)).as("n_events"))
    },

    // P2+P3: nested-document flattening — props JSON parsed to a struct,
    // then deterministically flattened to `_`-joined columns
    // (reference obj2plain, mongo.go:141-155).
    "p2_flatten" -> q { (s, dir) =>
      val parsed = Tables.load(s, dir, "events")
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))).as("props"))
      Transforms.flatten(parsed).orderBy("event_id")
    },

    // P4: scalar conversions at the sink boundary — array→JSON text,
    // content digest, ObjectID-style 24-hex key (mysql.go:399-406).
    "p4_scalar_convert" -> q { (s, dir) =>
      Tables.load(s, dir, "documents").select(
        col("doc_id"),
        to_json(split(col("text"), " ")).as("tokens_json"),
        md5(col("text")).as("content_md5"),
        lpad(format_string("%x", col("doc_id")), 24, "0").as("oid_hex"))
        .orderBy("doc_id")
    },

    // T1+O1+W1+W2 flagship: apply a change stream onto a base snapshot.
    // events = changelog keyed on user_id (signup→insert, error→delete,
    // else partial update of `balance`); per-key last-write-wins by
    // (ts, event_id), partial images preserve untouched columns
    // (mysql.go:456-459), final delete removes the row (mysql.go:507-534).
    "t1_cdc_apply" -> q { (s, dir) =>
      val base = Tables.load(s, dir, "customer").select(
        col("c_custkey").as("_id"),
        col("c_acctbal").as("balance"),
        col("c_mktsegment").as("segment"))
      val changes = Tables.load(s, dir, "events").select(
        col("user_id").as("_id"),
        when(col("event_type") === "error", "delete")
          .when(col("event_type") === "signup", "insert")
          .otherwise("update").as("op"),
        expr("ts div 1000").as("ts_us"),
        col("event_id"),
        col("value").as("balance"),
        lit(null).cast("string").as("segment"))
      MergeApply.applyChanges(base, changes, "_id", "op",
          Seq(col("ts_us"), col("event_id")), Seq("balance", "segment"))
        .orderBy("_id")
    },

    // T1+O1 sequential-fold apply: partial images touching DIFFERENT
    // columns of one key all contribute (the reference's one-op-at-a-time
    // loop, run.go:301-322, as one aggregate); explicit $unset markers null
    // a column; full images reset omitted columns; deletes bound history.
    // events become a mixed stream: signup→full image, error→delete, other
    // types→partials alternating which column they touch by event_id.
    "t1_fold_apply" -> q { (s, dir) =>
      val base = Tables.load(s, dir, "customer").select(
        col("c_custkey").as("_id"),
        col("c_acctbal").as("balance"),
        col("c_mktsegment").as("segment"))
      val op = when(col("event_type") === "error", "delete")
        .when(col("event_type") === "signup", "insert")
        .otherwise("update")
      val changes = Tables.load(s, dir, "events").select(
        col("user_id").as("_id"),
        op.as("op"),
        (op === "update").as("partial"),
        when(op === "update" && col("event_id") % 7 === 0, array(lit("segment")))
          .otherwise(array().cast("array<string>")).as("unsets"),
        expr("ts div 1000").as("ts_us"),
        col("event_id"),
        when(op === "insert", col("value"))
          .when(op === "update" && col("event_id") % 3 =!= 0, col("value"))
          .as("balance"),
        when(op === "insert", lit("NEW"))
          .when(op === "update" && col("event_id") % 3 === 0 &&
            col("event_id") % 7 =!= 0, col("event_type"))
          .cast("string").as("segment"))
      MergeApply.foldChanges(base, changes, "_id", "op", "partial", "unsets",
          Seq(col("ts_us"), col("event_id")), Seq("balance", "segment"))
        .orderBy("_id")
    },

    // J1: delete-reconciliation anti-join — sink keys absent from source
    // (replaces the reference's O(n) per-row FindOne loop, run.go:256-279).
    "j1_delete_reconcile" -> q { (s, dir) =>
      val sinkIds = Tables.load(s, dir, "customer").select(col("c_custkey").as("_id"))
      val sourceIds = Tables.load(s, dir, "orders").select(col("o_custkey").as("_id"))
      MergeApply.deleteReconcile(sinkIds, sourceIds, "_id").orderBy("_id")
    },

    // O1: per-key last-image reduction — order matters only per key, so a
    // window over (ts, event_id) replaces the serialized consumer
    // (run.go:301-322).
    "o1_last_image" -> q { (s, dir) =>
      val changes = Tables.load(s, dir, "events").select(
        col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
      MergeApply.lastImage(changes, Seq("user_id"), Seq(col("ts_us"), col("event_id")))
        .orderBy("user_id")
    },

    // S3: point lookup by key — expressed as a keyed filter so Catalyst
    // pushes EqualTo into the scan (the reference does a per-row FindOne,
    // mongo.go:677-693; at scale the batch form J1 replaces loops of this).
    "s3_point_lookup" -> q { (s, dir) =>
      Tables.load(s, dir, "customer")
        .filter(col("c_custkey") === 42L)
        .select(col("c_custkey").as("_id"), col("c_name"), col("c_acctbal"))
    },

    // D2: snapshot consistency — the reference fsync-locks Mongo during
    // snapshot (mongo.go:618-675); the scale replacement is an
    // offset-PINNED snapshot plus replay of the feed beyond the pin:
    // fold(events ≤ T) then apply(events > T) ≡ fold(all events). This
    // query computes the two-phase result; the oracle computes the
    // single-phase fold — equality IS the correctness of the barrier-free
    // snapshot.
    "d2_pinned_snapshot" -> q { (s, dir) =>
      val pinUs = 1704844800000000L // 2024-01-10T00:00:00Z
      val ev = Tables.load(s, dir, "events").select(
        col("user_id").as("_id"),
        when(col("event_type") === "error", "delete").otherwise("upsert").as("op"),
        expr("ts div 1000").as("ts_us"), col("event_id"),
        col("value").as("balance"))
      val snapshot = MergeApply.lastImage(
          ev.filter(col("ts_us") <= lit(pinUs)),
          Seq("_id"), Seq(col("ts_us"), col("event_id")))
        .filter(col("op") =!= "delete")
        .select(col("_id"), col("balance"))
      val replay = ev.filter(col("ts_us") > lit(pinUs))
      MergeApply.applyChanges(snapshot, replay, "_id", "op",
          Seq(col("ts_us"), col("event_id")), Seq("balance"))
        .orderBy("_id")
    },

    // D1: schema-reconciliation DDL planner (SyncTablesConfig,
    // mysql.go:146-290) over a fixed synthetic catalog — data-independent,
    // golden-checked by a VALUES oracle.
    "d1_schema_plan" -> q { (s, _) =>
      import s.implicits._
      val config = MappingConfig("mongodb://src", "mysql://dst", Seq(
        TableSpec("users", Seq(
          ColumnSpec("cfg.pub", "bigint(20)"),
          ColumnSpec("name", "varchar(100)"),
          ColumnSpec("flags", "blob"))),
        TableSpec("orders_repl", Seq(
          ColumnSpec("total", "double")))))
      val observed: SchemaSync.Catalog = Map(
        "users" -> Seq("_id" -> "varchar(24)", "name" -> "varchar(50)",
          "stale" -> "int", "cfg_pub" -> "bigint(20)"),
        "legacy_tab" -> Seq("_id" -> "varchar(24)"))
      val plan = SchemaSync.plan(config, observed, force = true)
      plan.ddl.zipWithIndex
        .map { case (d, i) => (i.toLong, d.sql) }
        .toDF("step", "ddl").orderBy("step")
    },
  )

  val oracles: Map[String, String] = Map(
    "s1_snapshot_project" ->
      """SELECT cast(o_orderkey AS varchar) AS _id, o_custkey, o_orderstatus,
         o_totalprice, o_orderpriority, CAST(NULL AS INT) AS loyalty_tier
         FROM orders ORDER BY _id""",

    "s2_changefeed_scan" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type
         FROM events
         WHERE event_type IN ('signup','purchase','error')
           AND epoch_us(ts) > 1704412800000000
         ORDER BY event_id""",

    "s4_key_scan" ->
      """SELECT o_orderkey AS _id FROM orders ORDER BY _id""",

    "f3_config_guard" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS total
         FROM events WHERE event_type IN ('click', 'purchase')
         GROUP BY event_type ORDER BY event_type""",

    "t1_decode_stream" ->
      """SELECT event_id, 'users' AS tbl, epoch_us(ts) AS ts_us,
           cast(user_id AS varchar) AS id,
           CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS kind,
           event_type NOT IN ('signup', 'error') AS partial,
           CASE WHEN event_type = 'error' THEN NULL ELSE value END AS balance
         FROM events ORDER BY event_id""",

    "t2_tx_unwrap" ->
      """WITH sel AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
           FROM events WHERE user_id % 50 = 0),
         mx AS (SELECT user_id, max(ts_us) AS tx_ts FROM sel GROUP BY user_id),
         ordered AS (
           SELECT s.user_id, s.event_type, s.value, m.tx_ts,
                  (row_number() OVER (PARTITION BY s.user_id ORDER BY s.event_id) - 1)::int AS seq
           FROM sel s JOIN mx m ON s.user_id = m.user_id)
         SELECT user_id, seq,
                CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS kind,
                tx_ts AS ts_us,
                CASE WHEN event_type = 'error' THEN NULL ELSE value END AS balance,
                event_type NOT IN ('signup', 'error') AS partial
         FROM ordered ORDER BY user_id, seq""",

    "s5_max_offset" ->
      """SELECT max(epoch_us(ts)) AS max_ts_us, count(*) AS n_events FROM events""",

    "p2_flatten" ->
      """SELECT event_id, json_extract(props, '$.k')::int AS props_k
         FROM events ORDER BY event_id""",

    "p4_scalar_convert" ->
      """SELECT doc_id, to_json(string_split(text, ' ')) AS tokens_json,
         md5(text) AS content_md5,
         lpad(printf('%x', doc_id), 24, '0') AS oid_hex
         FROM documents ORDER BY doc_id""",

    "t1_cdc_apply" ->
      """WITH ch AS (
           SELECT user_id AS _id,
                  CASE event_type WHEN 'error' THEN 'delete'
                                  WHEN 'signup' THEN 'insert'
                                  ELSE 'update' END AS op,
                  epoch_us(ts) AS ts_us, event_id, value AS balance
           FROM events),
         last AS (
           SELECT _id, op, balance FROM ch
           QUALIFY row_number() OVER (PARTITION BY _id
                                      ORDER BY ts_us DESC, event_id DESC) = 1),
         base AS (
           SELECT c_custkey AS _id, c_acctbal AS balance, c_mktsegment AS segment
           FROM customer)
         SELECT coalesce(b._id, l._id) AS _id,
                coalesce(l.balance, b.balance) AS balance,
                b.segment AS segment
         FROM base b FULL OUTER JOIN last l ON b._id = l._id
         WHERE l.op IS NULL OR l.op <> 'delete'
         ORDER BY _id""",

    // Mirrors foldChanges: per-column argmax at the last touching op
    // (full images & deletes touch every column; unset markers null one),
    // values struct-wrapped so a folded NULL survives arg_max.
    "t1_fold_apply" ->
      """WITH ch AS (
           SELECT user_id AS _id,
             CASE event_type WHEN 'error' THEN 'delete'
                             WHEN 'signup' THEN 'insert'
                             ELSE 'update' END AS op,
             epoch_us(ts) AS ts_us, event_id,
             CASE WHEN event_type = 'signup' THEN value
                  WHEN event_type NOT IN ('signup','error')
                       AND event_id % 3 <> 0 THEN value END AS bal,
             CASE WHEN event_type = 'signup' THEN 'NEW'
                  WHEN event_type NOT IN ('signup','error')
                       AND event_id % 3 = 0 AND event_id % 7 <> 0
                  THEN event_type END AS seg,
             (event_type NOT IN ('signup','error') AND event_id % 7 = 0) AS unset_seg
           FROM events),
         ev AS (
           SELECT *, (op = 'delete') AS isdel, (op <> 'update') AS resets,
             row_number() OVER (PARTITION BY _id ORDER BY ts_us, event_id) AS rn
           FROM ch),
         agg AS (
           SELECT _id,
             max(rn) AS lastrn,
             max(CASE WHEN resets THEN rn END) AS bord,
             coalesce(arg_max(isdel, CASE WHEN resets THEN rn END), false) AS bdel,
             max(CASE WHEN resets OR bal IS NOT NULL THEN rn END) IS NOT NULL AS t_bal,
             (arg_max({'v': CASE WHEN isdel THEN NULL ELSE bal END},
                      CASE WHEN resets OR bal IS NOT NULL THEN rn END)).v AS v_bal,
             max(CASE WHEN resets OR seg IS NOT NULL OR unset_seg THEN rn END) IS NOT NULL AS t_seg,
             (arg_max({'v': CASE WHEN isdel OR unset_seg THEN NULL ELSE seg END},
                      CASE WHEN resets OR seg IS NOT NULL OR unset_seg THEN rn END)).v AS v_seg
           FROM ev GROUP BY _id),
         base AS (
           SELECT c_custkey AS _id, c_acctbal AS balance, c_mktsegment AS segment
           FROM customer)
         SELECT coalesce(b._id, a._id) AS _id,
           CASE WHEN coalesce(a.t_bal, false) THEN a.v_bal ELSE b.balance END AS balance,
           CASE WHEN coalesce(a.t_seg, false) THEN a.v_seg ELSE b.segment END AS segment
         FROM base b FULL OUTER JOIN agg a ON b._id = a._id
         WHERE a._id IS NULL OR NOT (a.bdel AND a.bord = a.lastrn)
         ORDER BY _id""",

    "j1_delete_reconcile" ->
      """SELECT c_custkey AS _id FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         ORDER BY _id""",

    "o1_last_image" ->
      """SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value
         FROM events
         QUALIFY row_number() OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
         ORDER BY user_id""",

    "s3_point_lookup" ->
      """SELECT c_custkey AS _id, c_name, c_acctbal FROM customer
         WHERE c_custkey = 42""",

    "d2_pinned_snapshot" ->
      """WITH ev AS (
           SELECT user_id AS _id,
                  CASE WHEN event_type = 'error' THEN 'delete'
                       ELSE 'upsert' END AS op,
                  epoch_us(ts) AS ts_us, event_id, value AS balance
           FROM events)
         SELECT _id, balance FROM ev
         QUALIFY row_number() OVER (PARTITION BY _id
                                    ORDER BY ts_us DESC, event_id DESC) = 1
           AND op <> 'delete'
         ORDER BY _id""",

    "d1_schema_plan" ->
      """SELECT * FROM (VALUES
           (0::bigint, 'DROP TABLE `legacy_tab`'),
           (1::bigint, 'ALTER TABLE `users` DROP COLUMN `stale`'),
           (2::bigint, 'ALTER TABLE `users` DROP COLUMN `name`'),
           (3::bigint, 'ALTER TABLE `users` ADD COLUMN `name` varchar(100) NULL'),
           (4::bigint, 'ALTER TABLE `users` ADD COLUMN `flags` blob NULL'),
           (5::bigint, 'ALTER TABLE `users` CHANGE `cfg_pub` `cfg_pub` bigint(20) NULL AFTER `_id`'),
           (6::bigint, 'ALTER TABLE `users` CHANGE `name` `name` varchar(100) NULL AFTER `cfg_pub`'),
           (7::bigint, 'ALTER TABLE `users` CHANGE `flags` `flags` blob NULL AFTER `name`'),
           (8::bigint, 'CREATE TABLE `orders_repl` (`_id` varchar(24) NOT NULL, PRIMARY KEY (`_id`))'),
           (9::bigint, 'ALTER TABLE `orders_repl` ADD COLUMN `total` double NULL'),
           (10::bigint, 'ALTER TABLE `orders_repl` CHANGE `total` `total` double NULL AFTER `_id`')
         ) AS t(step, ddl) ORDER BY step""",
  )
}
