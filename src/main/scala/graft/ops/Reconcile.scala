package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table reconciliation — the verification step the reference's copy
  * pipeline lacks entirely (cqlcopy writes or reads a table and simply
  * trusts the transfer; `write.go`/`read.go` have no checksum path). At
  * 100 TB "did the copy corrupt or drop anything, and WHERE" must not
  * cost a sort or a shuffle of the data: this is the Merkle/anti-entropy
  * answer, as one narrow scan per side.
  *
  * [[tableDigest]] folds every row into one of `nBuckets` ORDER-
  * INDEPENDENT bucket digests (bit_xor of a 60-bit md5 prefix) plus a
  * row count. Two copies of a table agree iff all bucket rows match;
  * a divergence names the bucket(s), so the repair path re-transfers
  * 1/nBuckets of the data, not all of it. Everything derives from md5
  * of a canonical '|'-joined row string, so ANY engine recomputes the
  * digest table bit-for-bit — the cross-engine portability that makes
  * it a reconciliation protocol rather than an engine checksum.
  */
object Reconcile {

  /** Per-bucket (row count, xor digest), bucketed by the KEY hash and
    * digested over the full row — the Merkle-tree split Cassandra's
    * anti-entropy uses (token ranges = key hash ranges). Bucketing by
    * key, not content, is what makes the diff ACTIONABLE: a mutated
    * value diverges exactly its key's bucket with row counts intact
    * (repair = re-copy that key range); a dropped row shows as that
    * bucket's count-1. Content-derived buckets would move a mutated row
    * between buckets and smear one corruption across two diffs
    * (measured in ReconcileSpec before this shape was fixed).
    *
    * Scale: narrow scan → nBuckets-row map-side-combined aggregate; xor
    * is commutative/associative so partials are exact under any
    * partitioning and row order. No data shuffle — only nBuckets
    * partial rows per task. */
  def tableDigest(df: DataFrame, keyCols: Seq[Column], cols: Seq[Column],
                  nBuckets: Int): DataFrame = {
    // 15 hex chars = 60 bits, positive in a long
    val digest = conv(substring(md5(concat_ws("|", cols: _*)), 1, 15), 16, 10)
      .cast("long")
    val bucket = conv(substring(md5(concat_ws("|", keyCols: _*)), 1, 4), 16, 10)
      .cast("long") % nBuckets
    df.select(bucket.as("bucket"), digest.as("d"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(d)").as("xor_digest"))
  }

  /** Gate face (q99): the 64-bucket digest table of `lineitem`'s
    * identity+status columns (integers, flags, ISO date — columns with a
    * canonical cross-engine string form). The oracle recomputes every
    * bucket independently in DuckDB: equality IS the reconciliation
    * protocol working across engines. */
  def tableDigestGate(s: SparkSession, d: String): DataFrame =
    tableDigest(Tables.lineitem(s, d),
      keyCols = Seq(
        col("l_orderkey").cast("string"),
        col("l_linenumber").cast("string")),
      cols = Seq(
        col("l_orderkey").cast("string"),
        col("l_partkey").cast("string"),
        col("l_suppkey").cast("string"),
        col("l_linenumber").cast("string"),
        col("l_returnflag"),
        col("l_linestatus"),
        col("l_shipdate").cast("string")),
      nBuckets = 64)
      .orderBy(col("bucket"))

  /** The repair path (q100): given two copies of a table, name the
    * DIFFERING KEYS — without ever joining the full tables. Protocol:
    *
    *  1. digest both sides ([[tableDigest]]) → two nBuckets-row tables;
    *  2. join those (tiny) to find DIVERGED buckets (count or xor
    *     mismatch, or bucket present on one side only);
    *  3. re-scan both sides pruned to the diverged buckets (a broadcast
    *     semi-join against the ≤nBuckets-row diverged list — no collect,
    *     no literal) and compare per-key row digests with a full outer
    *     join on the key.
    *
    * At scale step 3 touches `diverged/nBuckets` of the data: a copy
    * with one corrupted range re-joins 1/64th of 100 TB, not all of it.
    * Step 1 is two narrow scans with a 64-row agg each. Requires keys
    * unique per side (duplicate keys would need a pre-agg; the harness
    * corpus's only safe choices are the single-column primary keys —
    * see [[diffKeysGate]]). Output: one row per differing key with
    * `status` ∈ mutated | only_left | only_right — equal by construction
    * to the DIRECT full diff, which is exactly what the q100 oracle
    * computes (protocol ≡ ground truth, the q93 convention). */
  def diffKeys(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               cols: Seq[Column], nBuckets: Int): DataFrame = {
    val key = keyCols.map(col)
    def digests(df: DataFrame) =
      tableDigest(df, key.map(_.cast("string")), cols, nBuckets)
    val diverged = digests(left).as("dl")
      .join(digests(right).as("dr"), Seq("bucket"), "full_outer")
      .where(col("dl.n_rows").isNull || col("dr.n_rows").isNull ||
        col("dl.n_rows") =!= col("dr.n_rows") ||
        col("dl.xor_digest") =!= col("dr.xor_digest"))
      .select(col("bucket"))
      .cache() // ≤nBuckets rows; keeps the 4 digest scans at 2
    def keyed(df: DataFrame, hName: String) = {
      val bucket = conv(substring(
          md5(concat_ws("|", key.map(_.cast("string")): _*)), 1, 4), 16, 10)
        .cast("long") % nBuckets
      df.select(key :+ bucket.as("bucket") :+
          md5(concat_ws("|", cols: _*)).as(hName): _*)
        .join(broadcast(diverged), Seq("bucket"), "left_semi")
    }
    keyed(left, "hl").as("l")
      .join(keyed(right, "hr").as("r"), keyCols, "full_outer")
      .where(col("hl").isNull || col("hr").isNull || col("hl") =!= col("hr"))
      .select(keyCols.map(col) :+
        when(col("hl").isNull, lit("only_right"))
          .when(col("hr").isNull, lit("only_left"))
          .otherwise(lit("mutated")).as("status"): _*)
  }

  /** Gate face (q100): reconcile `orders` against a deterministically
    * damaged copy of itself — mutations (o_custkey := -1 on keys ≡ 0
    * mod 97), deletions (keys ≡ 0 mod 101), and insertions (re-keyed as
    * -o_orderkey on keys ≡ 0 mod 103; negation can never collide with a
    * real key at ANY scale-up) — so all three statuses appear. `orders`
    * because its key is genuinely unique in the harness corpus
    * (lineitem's (orderkey, linenumber) is NOT — 45,832 distinct over
    * 60,000 rows at sf0.01 — which violates [[diffKeys]]'s precondition;
    * measured here before this face settled on orders). The oracle
    * computes the diff DIRECTLY (full-outer compare of row hashes in
    * DuckDB): equality proves the bucket-pruned protocol finds exactly
    * the true diff. */
  def diffKeysGate(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val damaged = o
      .withColumn("o_custkey",
        when(col("o_orderkey") % 97 === 0, lit(-1L))
          .otherwise(col("o_custkey")))
      .where(col("o_orderkey") % 101 =!= 0)
      .unionByName(o.where(col("o_orderkey") % 103 === 0)
        .withColumn("o_orderkey", -col("o_orderkey")))
    diffKeys(o, damaged,
      keyCols = Seq("o_orderkey"),
      cols = Seq(
        col("o_orderkey").cast("string"),
        col("o_custkey").cast("string"),
        col("o_orderstatus"),
        col("o_orderpriority")),
      nBuckets = 64)
      .orderBy(col("o_orderkey"))
  }

  val diffKeysSql: String =
    """WITH damaged AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 97 = 0 THEN -1 ELSE o_custkey END AS o_custkey,
      |    o_orderstatus, o_orderpriority
      |  FROM orders WHERE o_orderkey % 101 <> 0
      |  UNION ALL
      |  SELECT -o_orderkey, o_custkey, o_orderstatus, o_orderpriority
      |  FROM orders WHERE o_orderkey % 103 = 0),
      |lh AS (
      |  SELECT o_orderkey,
      |    md5(concat_ws('|', CAST(o_orderkey AS VARCHAR),
      |      CAST(o_custkey AS VARCHAR), o_orderstatus, o_orderpriority)) AS h
      |  FROM orders),
      |rh AS (
      |  SELECT o_orderkey,
      |    md5(concat_ws('|', CAST(o_orderkey AS VARCHAR),
      |      CAST(o_custkey AS VARCHAR), o_orderstatus, o_orderpriority)) AS h
      |  FROM damaged)
      |SELECT coalesce(lh.o_orderkey, rh.o_orderkey) AS o_orderkey,
      |  CASE WHEN lh.h IS NULL THEN 'only_right'
      |       WHEN rh.h IS NULL THEN 'only_left'
      |       ELSE 'mutated' END AS status
      |FROM lh FULL OUTER JOIN rh ON lh.o_orderkey = rh.o_orderkey
      |WHERE lh.h IS DISTINCT FROM rh.h
      |ORDER BY 1, 2""".stripMargin

  /** CDC merge-upsert (q102) — the APPLY step that completes the family:
    * q99 detects divergence, q100 names the differing keys, and this
    * folds a keyed+versioned changelog into a base snapshot (the
    * incremental form of the reference's whole-table copy — `write.go`
    * can only ever re-transfer everything). Semantics: the log is rows
    * of (key…, payload…, version, op ∈ U|D); the new snapshot keeps,
    * per key, the payload of the HIGHEST version, and drops the key iff
    * that winning row is a delete. Base rows enter as version-0 upserts,
    * so insert / update / delete / delete-then-resurrect all reduce to
    * "latest version wins".
    *
    * Shape: ONE map-side-combined aggregate — `max_by(payload struct,
    * version)` — not the `row_number() OVER (PARTITION BY key ORDER BY
    * version DESC)` window everyone writes first. The buffer carries a
    * struct with strings, so Spark plans SortAggregate rather than
    * HashAggregate — but the partial STILL runs map-side: each task
    * collapses its versions to one struct per key BEFORE the shuffle.
    * The window formulation must shuffle every version of every key and
    * sort after the exchange; here the exchange carries only collapsed
    * winners, so a hot key with a million log entries ships ~tasks rows
    * instead of a million — the q97 bounded-agg-beats-window argument
    * applied to merge semantics (both plans sort the log once; only
    * this one shrinks it before the wire, and the shuffle is the 100 TB
    * bottleneck). The q102 oracle IS the window formulation (DuckDB
    * `row_number()`), so gate equality proves agg ≡ sort row-for-row.
    * Precondition: (key, version) unique — ties would make the winner
    * nondeterministic (both engines would pick arbitrarily, and
    * differently).
    */
  def mergeUpsert(log: DataFrame, keyCols: Seq[String], versionCol: String,
                  opCol: String): DataFrame = {
    val payload = log.columns.filterNot(keyCols.contains).map(col)
    log.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload: _*), col(versionCol)).as("w"))
      .select(keyCols.map(col) :+ col("w.*"): _*)
      .where(col(opCol) === "U")
      .drop(opCol)
  }

  /** Gate face (q102): apply a deterministic 5-tier changelog to
    * `orders` (base = version 0). Tiers give every CDC case distinct
    * versions so (key, version) stays unique by construction:
    * v1 updates keys ≡1 (mod 7) to status 'X'; v2 re-updates the ≡1
    * (mod 21) subset to 'Y' (multi-update last-wins); v3 deletes keys
    * ≡2 (mod 11) — including some just updated (delete-after-update);
    * v4 resurrects the ≡2 (mod 55) subset as 'Z' (upsert-after-delete);
    * v1 also inserts brand-new keys as -o_orderkey for ≡3 (mod 13)
    * (negation never collides with a real key at any scale-up, the
    * q100 convention). */
  def mergeUpsertGate(s: SparkSession, d: String): DataFrame =
    mergeUpsert(changeLogTiers(Tables.orders(s, d)).reduce(_.unionByName(_)),
      Seq("o_orderkey"), "version", "op")
      .orderBy(col("o_orderkey"))

  /** The q102/q103 changelog tiers (base first), kept SEPARATE so the
    * streaming face (q103) can deliver them across distinct micro-
    * batches — base, then each mutation wave, arriving as its own file. */
  def changeLogTiers(orders: DataFrame): Seq[DataFrame] = {
    val o = orders
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    def tier(df: DataFrame, version: Int, op: String) =
      df.withColumn("version", lit(version.toLong)).withColumn("op", lit(op))
    Seq(
      tier(o, 0, "U"),
      tier(o.where(col("o_orderkey") % 7 === 1)
        .withColumn("o_orderstatus", lit("X")), 1, "U"),
      tier(o.where(col("o_orderkey") % 13 === 3)
        .withColumn("o_orderkey", -col("o_orderkey")), 1, "U"),
      tier(o.where(col("o_orderkey") % 21 === 1)
        .withColumn("o_orderstatus", lit("Y")), 2, "U"),
      tier(o.where(col("o_orderkey") % 11 === 2), 3, "D"),
      tier(o.where(col("o_orderkey") % 55 === 2)
        .withColumn("o_orderstatus", lit("Z")), 4, "U"))
  }

  /** The q102/q119 changelog as a DuckDB CTE body — ONE text shared by
    * both oracles so the two faces provably read the same log. */
  private val changeLogSqlCte: String =
    """log AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
      |    0 AS version, 'U' AS op FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, 'X', o_orderpriority, 1, 'U'
      |  FROM orders WHERE o_orderkey % 7 = 1
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, 'Y', o_orderpriority, 2, 'U'
      |  FROM orders WHERE o_orderkey % 21 = 1
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, 3, 'D'
      |  FROM orders WHERE o_orderkey % 11 = 2
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, 'Z', o_orderpriority, 4, 'U'
      |  FROM orders WHERE o_orderkey % 55 = 2
      |  UNION ALL
      |  SELECT -o_orderkey, o_custkey, o_orderstatus, o_orderpriority, 1, 'U'
      |  FROM orders WHERE o_orderkey % 13 = 3)""".stripMargin

  val mergeUpsertSql: String =
    s"""WITH $changeLogSqlCte,
      |ranked AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY o_orderkey ORDER BY version DESC) AS rn
      |  FROM log)
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
      |  CAST(version AS BIGINT) AS version
      |FROM ranked WHERE rn = 1 AND op = 'U'
      |ORDER BY o_orderkey""".stripMargin

  /** q119 — SCD2 history intervalization: turn the same keyed+versioned
    * changelog q102 COLLAPSES into the full slowly-changing-dimension
    * history table it IMPLIES (Kimball type-2: one row per version of
    * each key, carrying its validity interval). Per key ordered by
    * version: `valid_from` = the row's version, `valid_to` = the NEXT
    * log entry's version (any op — an update supersedes, a delete
    * closes), null = still open; `is_current` = open upsert. Delete
    * rows emit nothing themselves — a deleted-then-resurrected key
    * (v3 D, v4 U in the gate log) correctly shows a validity GAP
    * [3, 4) during which the key did not exist.
    *
    * Shape: where q102 could pre-collapse map-side (only the winner
    * survives), a HISTORY table outputs every version, so the minimal
    * plan is the per-key window itself: one shuffle keyed on the
    * dimension key carrying exactly the rows that will be emitted,
    * then a sort-within-partition and a single-row lookahead (`lead`)
    * — no second pass, no self-join on version ranges (the first-write
    * formulation everyone reaches for, which shuffles the log twice
    * and probes it quadratically per key). At 100 TB the cost is one
    * shuffle of the changelog — the floor for this semantics, since
    * every output row depends on its key's successor.
    *
    * Precondition (shared with q102): (key, version) unique — a tied
    * version would make the interval chain ambiguous in any engine. */
  def scd2History(log: DataFrame, keyCols: Seq[String], versionCol: String,
                  opCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol))
    val payload = log.columns
      .filterNot(c => keyCols.contains(c) || c == versionCol || c == opCol)
    log.withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .where(col(opCol) === "U")
      .select(keyCols.map(col) ++ payload.map(col) :+
        col(versionCol).as("valid_from") :+ col("valid_to") :+
        col("valid_to").isNull.as("is_current"): _*)
  }

  /** Gate face (q119): the q102 changelog, intervalized. Every CDC case
    * lands a distinct interval shape: multi-update keys get chained
    * [0,1) [1,2) [2,∞); deleted keys get a closed [0,3) and no open
    * row; resurrected keys get the [3,4) gap then an open [4,∞). */
  def scd2Gate(s: SparkSession, d: String): DataFrame =
    scd2History(changeLogTiers(Tables.orders(s, d)).reduce(_.unionByName(_)),
      Seq("o_orderkey"), "version", "op")
      .orderBy(col("o_orderkey"), col("valid_from"))

  val scd2Sql: String =
    s"""WITH $changeLogSqlCte,
      |iv AS (
      |  SELECT *, lead(version) OVER (
      |    PARTITION BY o_orderkey ORDER BY version) AS valid_to
      |  FROM log)
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
      |  CAST(version AS BIGINT) AS valid_from,
      |  CAST(valid_to AS BIGINT) AS valid_to,
      |  valid_to IS NULL AS is_current
      |FROM iv WHERE op = 'U'
      |ORDER BY o_orderkey, valid_from""".stripMargin

  /** q130 — REFERENTIAL-INTEGRITY AUDIT: every foreign-key edge of the
    * star schema checked in one pass per edge — child rows, orphan rows
    * (no matching parent key), distinct orphan keys. The data-quality
    * gate a copy pipeline runs after landing (the reference trusts the
    * transfer; see [[Reconcile]] preamble) and a training pipeline runs
    * before joining facts to dims: a broken FK silently drops rows in
    * every downstream inner join.
    *
    * Shape per edge — SIZE-ROUTED on the parent's RAW row count (a
    * `count()` Spark usually serves from parquet footers — cheap, but
    * not guaranteed scan-free — MEMOIZED per (session, dir, table) via
    * [[SharedPlans.cachedCount]] so constructing the audit costs the
    * routing jobs once per session, not once per DataFrame build (r11
    * advice). The keyset is ≤ rows, so routing on rows is a
    * conservative upper bound — the r11 decade probes showed
    * per-edge `distinct().count()` routing jobs were themselves a
    * material cost at sf10+; the q112 self-routing precedent, r10
    * verdict item 1 — the old code force-broadcast EVERY parent,
    * including lineitem→orders whose keyset scales with the corpus and
    * is unbroadcastable at 100 TB):
    *
    *  - parent rows < [[FkFactMinKeys]] (all dims, and customer at dim
    *    scale): child ROWS left-join the broadcast keyset — no shuffle
    *    at all, partial aggregate on top. The hint is safe here BECAUSE
    *    the route just bounded the keyset.
    *  - at/above (lineitem→orders from sf10 up): [[fkFactEdge]] — the
    *    child reduces to (key, count) FIRST (map-side combined, so the
    *    shuffle carries distinct keys, not rows), then a CO-PARTITIONED
    *    shuffle left-join against the parent keyset with NO broadcast
    *    hint — Spark/AQE stays free to pick the physical join from
    *    runtime sizes. The optional q90-style Bloom pre-filter
    *    (`bloom = true`) diverts definitely-orphan keys around the
    *    join — no false negatives — which pays exactly in the
    *    orphan-HEAVY unvetted-ingest regime; it is OFF on the audit
    *    face because when orphans are rare (the audit's own null
    *    hypothesis) every key passes the filter and the parent-pass
    *    build + per-key probes are pure overhead (r11 sf10/sf30
    *    measurement, BASELINE). Past [[FkBloomMaxBits]] the Bloom
    *    degrades to the plain keyset join regardless — the honest
    *    fundamental cost of an exact audit at that scale. */
  def fkAudit(s: SparkSession, d: String): DataFrame = {
    def edge(name: String, child: DataFrame, ck: String,
        parent: DataFrame, pk: String): DataFrame = {
      // keyed by the PARENT table (pk's prefix), not the edge: nation
      // parents two edges — one count serves both
      val parentRows = SharedPlans.cachedCount(s, s"fkParentRows|$d|$pk")(
        parent.count())
      if (parentRows >= FkFactMinKeys)
        fkFactEdge(name, child, ck, parent, pk)
      else
        child.select(col(ck).as("k"))
          .join(broadcast(parent.select(col(pk).as("k")).distinct()
            .withColumn("ex", lit(1))), Seq("k"), "left")
          .agg(count(lit(1)).as("n_child"),
            sum(when(col("ex").isNull, 1L).otherwise(0L)).as("n_orphans"),
            countDistinct(when(col("ex").isNull, col("k"))).as("n_orphan_keys"))
          .select(lit(name).as("fk"), col("n_child"), col("n_orphans"),
            col("n_orphan_keys"))
    }
    val edges = Seq(
      edge("customer.c_nationkey->nation", Tables.customer(s, d), "c_nationkey",
        Tables.nation(s, d), "n_nationkey"),
      edge("lineitem.l_orderkey->orders", Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey"),
      edge("lineitem.l_partkey->part", Tables.lineitem(s, d), "l_partkey",
        Tables.part(s, d), "p_partkey"),
      edge("lineitem.l_suppkey->supplier", Tables.lineitem(s, d), "l_suppkey",
        Tables.supplier(s, d), "s_suppkey"),
      edge("nation.n_regionkey->region", Tables.nation(s, d), "n_regionkey",
        Tables.region(s, d), "r_regionkey"),
      edge("orders.o_custkey->customer", Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey"),
      edge("supplier.s_nationkey->nation", Tables.supplier(s, d), "s_nationkey",
        Tables.nation(s, d), "n_nationkey"))
    edges.reduce(_ unionAll _).orderBy(col("fk"))
  }

  /** Parent row count at which an FK edge stops broadcasting: 2^22
    * keys ≈ 32 MB of longs — past the point where a forced broadcast
    * is a per-executor memory tax rather than a saving. (Routing reads
    * the RAW count — metadata-only — as an upper bound on the keyset.)
    * Orders crosses it at sf10 (15M keys); the dims never do. */
  private[graft] val FkFactMinKeys: Long = 1L << 22

  /** Bloom cap for the fact edge: past 2^30 bits the word array
    * [[Bloom.buildBits]] collects is ≥ 128 MB of driver memory — the
    * filter would become the bottleneck it exists to remove. Covers
    * parents to ~67M keys at 16 bits/key. */
  private[graft] val FkBloomMaxBits: Long = 1L << 30

  /** The fact-scale FK edge (see [[fkAudit]]): keyset-reduced child,
    * hint-free shuffle left-join, optionally Bloom-diverting definite
    * orphans around the join first (`bloom` — the orphan-heavy-ingest
    * knob; see the regime analysis on [[fkAudit]]). Output row is
    * identical to the broadcast edge's under either setting — the q130
    * spec asserts the equality on both paths and the plan shape (no
    * BroadcastExchange with auto-broadcast off). */
  private[graft] def fkFactEdge(name: String, child: DataFrame, ck: String,
      parent: DataFrame, pk: String, bloom: Boolean = false): DataFrame = {
    val childKeys = child.groupBy(col(ck).as("k")).agg(count(lit(1)).as("cnt"))
    val parentKeys = parent.select(col(pk).as("k")).distinct()
    val m = if (bloom) Bloom.sizeBits(parentKeys.count()) else Long.MaxValue
    val (definite, maybe) =
      if (m <= FkBloomMaxBits) {
        val bits = Bloom.buildBits(parentKeys, col("k"), Bloom.DefaultHashes, m)
        val probe = Bloom.mightContain(bits, col("k"), Bloom.DefaultHashes, m)
        // negative probe = certainly absent from parent (no false
        // negatives) → orphan without touching the join; NULL keys
        // ride the join branch where a never-matching left join
        // reproduces the oracle's NULL semantics exactly (orphan ROW,
        // not an orphan KEY — count(k) skips NULL)
        (childKeys.where(col("k").isNotNull && !probe),
          childKeys.where(col("k").isNull || probe))
      } else (childKeys.where(lit(false)), childKeys)
    val resolved = maybe
      .join(parentKeys.withColumn("ex", lit(1)), Seq("k"), "left")
    definite.withColumn("ex", lit(null).cast("int")).unionByName(resolved)
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n_child"),
        coalesce(sum(when(col("ex").isNull, col("cnt"))), lit(0L)).as("n_orphans"),
        count(when(col("ex").isNull, col("k"))).as("n_orphan_keys"))
      .select(lit(name).as("fk"), col("n_child"), col("n_orphans"),
        col("n_orphan_keys"))
  }

  val fkAuditSql: String = {
    val edges = Seq(
      ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
      ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
      .map { case (name, ct, ck, pt, pk) =>
        s"""SELECT '$name' AS fk, count(*) AS n_child,
           |   CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
           |   CAST(count(DISTINCT CASE WHEN p.k IS NULL THEN c.$ck END) AS BIGINT) AS n_orphan_keys
           | FROM $ct c LEFT JOIN (SELECT DISTINCT $pk AS k FROM $pt) p
           |   ON c.$ck = p.k""".stripMargin
      }.mkString("\n UNION ALL\n")
    s"WITH a AS (\n $edges)\nSELECT * FROM a ORDER BY fk"
  }

  /** q131 — ERASURE (right-to-be-forgotten) CASCADE AUDIT: delete
    * requests arrive as a subject list (here customers with
    * c_custkey % 97 = 0, the deterministic stand-in for a request
    * table); the cascade follows the FK graph — customer → orders →
    * lineitem — and the face emits the per-table audit a compliance
    * pipeline must log: rows before, rows erased, rows after. The
    * actual delete is the complement anti-join (kept = NOT IN cascade),
    * counted here rather than materialized so the face is a pure audit.
    *
    * Scale: the subject list is tiny (requests, not data) and
    * broadcasts; orders-to-erase is subject-keyed (broadcast semi-join);
    * the lineitem leg joins against erased ORDER KEYS — still request-
    * sized in any real corpus — so no corpus-sized side ever shuffles.
    * Counts are map-side-combined aggregates. */
  def erasureCascade(s: SparkSession, d: String): DataFrame = {
    val subjects = Tables.customer(s, d)
      .where(col("c_custkey") % 97 === 0).select(col("c_custkey"))
    val custAll = Tables.customer(s, d)
    val ordAll = Tables.orders(s, d)
    val liAll = Tables.lineitem(s, d)
    val delOrders = ordAll.join(broadcast(subjects),
      ordAll("o_custkey") === subjects("c_custkey"), "left_semi")
      .select(col("o_orderkey"))
    def row(table: String, all: DataFrame, deleted: DataFrame): DataFrame =
      all.agg(count(lit(1)).as("n_before"))
        .crossJoin(deleted.agg(count(lit(1)).as("n_erased")))
        .select(lit(table).as("table_name"), col("n_before"), col("n_erased"),
          (col("n_before") - col("n_erased")).as("n_after"))
    val delLi = liAll.join(broadcast(delOrders),
      liAll("l_orderkey") === delOrders("o_orderkey"), "left_semi")
    row("customer", custAll,
        custAll.join(broadcast(subjects), custAll("c_custkey") === subjects("c_custkey"), "left_semi"))
      .unionAll(row("lineitem", liAll, delLi))
      .unionAll(row("orders", ordAll, delOrders))
      .orderBy(col("table_name"))
  }

  val erasureCascadeSql: String =
    """WITH subj AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
      | delo AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM subj)),
      | dell AS (SELECT l_orderkey FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM delo)),
      | a AS (
      |  SELECT 'customer' AS table_name,
      |    (SELECT count(*) FROM customer) AS n_before,
      |    (SELECT count(*) FROM subj) AS n_erased
      |  UNION ALL
      |  SELECT 'lineitem',
      |    (SELECT count(*) FROM lineitem), (SELECT count(*) FROM dell)
      |  UNION ALL
      |  SELECT 'orders',
      |    (SELECT count(*) FROM orders), (SELECT count(*) FROM delo))
      |SELECT table_name, n_before, n_erased, n_before - n_erased AS n_after
      |FROM a ORDER BY table_name""".stripMargin

  /** q136 — POINT-IN-TIME (as-of version) SCD2 dimension join: each
    * fact row joined to the dimension version that was valid AT ITS OWN
    * effective version — the feature-store / "no data leakage" join
    * that makes training features reproducible ("what did the
    * dimension say when this event happened?", not "what does it say
    * now"). Facts are lineitem rows with a per-row effective version
    * (`l_partkey % 5`, spanning every tier of the q119 changelog);
    * the dimension is q119's SCD2 history of orders.
    *
    * Semantics: fact matches the history row with
    * `valid_from <= v < coalesce(valid_to, ∞)` for its key. SCD2
    * intervals are disjoint per key (q119's lead-chain construction),
    * so each fact matches AT MOST one version — a fact whose version
    * falls in a deletion gap (or before the key existed) drops out,
    * exactly the rows a current-state join would silently mis-attribute.
    *
    * Shape: the join is KEY-EQUI on o_orderkey with the interval
    * predicate inside the join condition — co-partitioned fact/history
    * shuffle, per-key fan-out bounded by versions-per-key (≤ 5 here;
    * bounded by changelog depth in general), never a cross product.
    * Output is a (versions × status) bounded aggregate. */
  def pointInTimeJoin(s: SparkSession, d: String): DataFrame = {
    val hist = scd2History(
      changeLogTiers(Tables.orders(s, d)).reduce(_.unionByName(_)),
      Seq("o_orderkey"), "version", "op")
    val facts = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"),
        (col("l_partkey") % 5).as("as_of"))
    facts.join(hist,
        facts("l_orderkey") === hist("o_orderkey") &&
          col("valid_from") <= col("as_of") &&
          (col("valid_to").isNull || col("as_of") < col("valid_to")))
      .groupBy(col("as_of"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_facts"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("as_of"), col("o_orderstatus"))
  }

  /** Oracle for [[pointInTimeJoin]]: the interval join replayed over the
    * shared q102/q119 changelog CTE. */
  val pointInTimeJoinSql: String =
    s"""WITH $changeLogSqlCte,
      |iv AS (
      |  SELECT o_orderkey, o_orderstatus, version AS valid_from,
      |    lead(version) OVER (PARTITION BY o_orderkey ORDER BY version)
      |      AS valid_to, op
      |  FROM log),
      |hist AS (SELECT * FROM iv WHERE op = 'U'),
      |facts AS (
      |  SELECT l_orderkey, l_quantity, l_partkey % 5 AS as_of
      |  FROM lineitem)
      |SELECT f.as_of, h.o_orderstatus, count(*) AS n_facts,
      |  round(sum(f.l_quantity), 2) AS sum_qty
      |FROM facts f JOIN hist h ON f.l_orderkey = h.o_orderkey
      |  AND h.valid_from <= f.as_of
      |  AND (h.valid_to IS NULL OR f.as_of < h.valid_to)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val tableDigestSql: String =
    """WITH r AS (
      |  SELECT
      |    md5(concat_ws('|',
      |      CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))) AS hk,
      |    md5(concat_ws('|',
      |      CAST(l_orderkey AS VARCHAR), CAST(l_partkey AS VARCHAR),
      |      CAST(l_suppkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
      |      l_returnflag, l_linestatus, CAST(l_shipdate AS VARCHAR))) AS h
      |  FROM lineitem)
      |SELECT CAST('0x' || substr(hk, 1, 4) AS BIGINT) % 64 AS bucket,
      |  count(*) AS n_rows,
      |  bit_xor(CAST('0x' || substr(h, 1, 15) AS BIGINT)) AS xor_digest
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
}
