package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Portable Bloom filter + bloom semi-join — the join pre-filter that
  * matters at 100 TB: when the small side's KEY SET is too large to
  * broadcast as a hash table but the big side would shuffle terabytes for
  * a semi-join, an m-bit Bloom filter broadcasts at CONSTANT size
  * (m/8 bytes, independent of small-side row count) and filters the big
  * side with a narrow, codegen'd, zero-shuffle predicate. No false
  * negatives (every true match survives); false positives are bounded by
  * the fill factor and removed by whatever exact join follows — the
  * filter's job is only to shrink what reaches that join's shuffle.
  *
  * PORTABLE by construction (the q77/q78 sketch convention): bit
  * positions are md5-derived (`H_i(key) = int(md5(key || '#' || i)[0,10))
  * mod m`), so an oracle replays the identical filter arithmetic —
  * Spark's own internal runtime bloom pruning is engine-private and
  * unverifiable; this one is cross-engine exact. */
object Bloom {

  val DefaultBits: Long = 1L << 20 // 128 KiB bitset
  val DefaultHashes: Int = 4

  /** Above this m the bitset no longer rides as a plan literal: a 2^24-bit
    * set is a 256Ki-element long array — past that, plan serialization
    * and the codegen constant pool pay per-task costs for what should be
    * per-JVM state, so [[mightContain]] switches to a broadcast-variable
    * probe ([[graft.functions.BloomExprs.BloomProbe]]). Semantics are
    * identical in both regimes; only the literal regime is DuckDB-
    * replayable, which is fine — the gate face pins m inside it. */
  val MaxLiteralBits: Long = 1L << 24

  /** Hard ceiling on m: 2^36 bits = 8 GiB of words, and m/64 must stay an
    * int array index ([[buildBits]]'s word array, the probe's element
    * lookup — ADVICE r7: the unguarded int cast overflowed past 2^37).
    * At the 16-bits/key design fill this covers a ~4.3B-key build side;
    * the PRACTICAL ceiling is broadcast memory (m/8 bytes ≈ 1 GiB at
    * 2^33). Beyond either, a Bloom pre-filter is the wrong tool — the
    * build side is no longer meaningfully smaller than the probe side,
    * so shuffle the exact semi-join directly. */
  val MaxBits: Long = 1L << 36

  /** Auto-size the bitset to the build-side key count: ~16 bits/key
    * (fill ≈ 22% at k=4 → false-positive rate ≈ 0.2%), rounded up to a
    * power of two, floored at [[DefaultBits]], CAPPED at [[MaxBits]]
    * (past the cap the fill factor grows past the design point and the
    * filter degrades gracefully — by then use an exact semi-join). A
    * FIXED m saturates as the key set grows — measured in round 7: at
    * 10× the keys that fit, fill hits 68% and the false-positive rate
    * 21%, and the filter stops filtering. 16 bits/key is 2 BYTES of
    * broadcast per key — still ~1000× smaller than broadcasting the
    * keys themselves. */
  def sizeBits(nKeys: Long): Long = {
    var m = DefaultBits
    while (m < 16L * nKeys && m < MaxBits) m <<= 1
    m
  }

  /** The k bit positions for a key — 40-bit md5 prefixes mod m, one per
    * salt, all codegen'd built-ins. */
  def positions(key: Column, k: Int, m: Long): Column =
    array((0 until k).map(i =>
      conv(substring(md5(concat(key, lit("#" + i))), 1, 10), 16, 10)
        .cast("long") % m): _*)

  /** Build the bitset from the small side's keys. Distributed part is a
    * distinct + a 64-bit-word `bit_or` aggregate — map-side combined,
    * output BOUNDED by m/64 rows (16,384 at the default m) regardless of
    * input size; only that constant-size word table reaches the driver. */
  def buildBits(small: DataFrame, key: Column,
      k: Int = DefaultHashes, m: Long = DefaultBits): Array[Long] = {
    require(m > 0 && m <= MaxBits,
      s"bloom m=$m outside (0, 2^36]: m/64 must stay an int array index " +
        s"and the word array m/8 bytes of memory — see Bloom.MaxBits")
    val words = small
      .select(explode(positions(key.cast("string"), k, m)).as("pos"))
      .distinct()
      .groupBy(expr("pos div 64").as("w")) // div: long division, `/` is double
      .agg(bit_or(element_at(WordMasks, (col("pos") % 64).cast("int") + 1)).as("bits"))
      .collect()
    val arr = new Array[Long]((m / 64).toInt)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  // single-bit masks as a 64-element array literal: Spark's shiftleft
  // only accepts a literal shift amount, so the variable shift is a
  // lookup instead (one Literal node, codegen-friendly)
  private val WordMasks: Column = typedLit((0 until 64).map(1L << _))

  /** Membership predicate against a built bitset: all k positions set.
    * The check is `forall` over the positions array so the k md5s are
    * computed EXACTLY ONCE per row — spelling the conjuncts out with k
    * separate `element_at(ps, i)` references duplicates the positions
    * subtree into every conjunct (k² md5s/row after optimization;
    * measured 40% of q90's sf10 wall before the rewrite). No join, no
    * shuffle, no state on the big side.
    *
    * Two size regimes, identical semantics (incl. NULL-key → NULL):
    *  - m ≤ [[MaxLiteralBits]]: the bitset rides as ONE array literal (a
    *    single `Literal` node, not 16k children) — portable, the oracle
    *    replays it in SQL.
    *  - m > [[MaxLiteralBits]]: the bitset ships as a BROADCAST VARIABLE
    *    probed by a codegen'd expression
    *    ([[graft.functions.BloomExprs.BloomProbe]]) — per-JVM fetch, no
    *    plan-size / constant-pool growth at any m up to [[MaxBits]]. */
  def mightContain(bits: Array[Long], key: Column,
      k: Int = DefaultHashes, m: Long = DefaultBits): Column = {
    require(m > 0 && m <= MaxBits,
      s"bloom m=$m outside (0, 2^36] — see Bloom.MaxBits")
    val ps = positions(key.cast("string"), k, m)
    if (m <= MaxLiteralBits) {
      val bitsLit = typedLit(bits.toSeq)
      forall(ps, pos =>
        // pos < 2^24 in this regime so the double division is exact;
        // int cast truncates = floor for positives
        element_at(bitsLit, (pos / 64).cast("int") + 1)
          .bitwiseAND(element_at(WordMasks, (pos % 64).cast("int") + 1)) =!= 0L)
    } else {
      val sc = org.apache.spark.sql.SparkSession.active.sparkContext
      org.apache.spark.sql.GraftBridge.column(
        graft.functions.BloomExprs.BloomProbe(
          org.apache.spark.sql.GraftBridge.expression(ps), sc.broadcast(bits)))
    }
  }

  /** Bloom semi-join: big rows whose key might be in small's key set.
    * Exactly the rows an exact semi-join keeps, plus a bounded
    * false-positive remainder — never fewer. m auto-sizes to the build
    * side ([[sizeBits]]) unless pinned. */
  def bloomSemiJoin(big: DataFrame, bigKey: Column, small: DataFrame,
      smallKey: Column, k: Int = DefaultHashes, m: Long = 0L): DataFrame = {
    val mm = if (m > 0) m else sizeBits(small.count())
    big.where(mightContain(buildBits(small, smallKey, k, mm), bigKey, k, mm))
  }

  /** Bloom-ACCELERATED anti-join — incremental dedup against a historical
    * corpus, the pattern behind "drop documents we already ingested"
    * without shuffling today's whole batch: rows whose keys the filter
    * has NEVER seen are definitely new (no false negatives) and bypass
    * the join entirely; only the maybe-duplicate remainder (true dups +
    * the ~0.2% false positives) reaches the exact LEFT ANTI join, which
    * removes the false positives. Result is EXACTLY the plain anti-join
    * INCLUDING for NULL keys — the bloom changes the cost, not the
    * answer: the shuffle carries fill-factor-bounded candidates instead
    * of the full big side, at the price of a second (cheap,
    * pushdown-friendly) scan. NULL-key big rows route to the exact
    * branch (the probe is NULL for a NULL key, which would satisfy
    * NEITHER filter and silently drop the row — ADVICE r7); there the
    * anti-join keeps them, as a plain anti-join does (a NULL key equals
    * nothing, so the join condition is never met). */
  def bloomAntiJoin(big: DataFrame, bigKey: Column, small: DataFrame,
      smallKey: Column, k: Int = DefaultHashes, m: Long = 0L): DataFrame = {
    val mm = if (m > 0) m else sizeBits(small.count())
    val bits = buildBits(small, smallKey, k, mm)
    val probe = mightContain(bits, bigKey, k, mm)
    val definitelyNew = big.where(bigKey.isNotNull && !probe)
    val maybeDup = big.where(bigKey.isNull || probe)
    val keyName = "__bloom_key"
    val survivors = maybeDup.join(
      small.select(smallKey.as(keyName)).distinct(),
      bigKey === col(keyName), "left_anti")
    definitelyNew.union(survivors)
  }

  /** Gate face (q93): orders from customers OUTSIDE the BUILDING segment
    * via [[bloomAntiJoin]]; the oracle is the plain batch anti-join —
    * result equality IS the false-positive-correction proof. */
  def bloomAntiJoinGate(s: SparkSession, d: String): DataFrame = {
    val customers = Tables.customer(s, d)
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val m = sizeBits(customers.count())
    bloomAntiJoin(Tables.orders(s, d), col("o_custkey"),
        customers, col("c_custkey"), DefaultHashes, m)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_orderpriority"))
  }

  val bloomAntiJoinSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders o
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM customer c
      |  WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Gate face (q90): filter orders by a Bloom of BUILDING-segment
    * customers; emit exact counts — probe size, bits set, bloom
    * survivors, true matches, false positives. The oracle replays the
    * identical position arithmetic in DuckDB, so survivor counts match
    * bit-for-bit; n_true <= n_candidates is the no-false-negative
    * contract, checked exactly because BOTH counts are in the row. */
  def bloomJoinGate(s: SparkSession, d: String): DataFrame = {
    val customers = Tables.customer(s, d)
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val orders = Tables.orders(s, d)
    // auto-size to the key count (the oracle literal models m = 2^20;
    // SparkEntry.oracleDowngrades drops the oracle when m departs)
    val m = sizeBits(customers.count())
    val bits = buildBits(customers, col("c_custkey"), DefaultHashes, m)
    val nBitsSet = bits.map(java.lang.Long.bitCount).sum.toLong
    val cand = orders.where(mightContain(bits, col("o_custkey"), DefaultHashes, m))
      .agg(count(lit(1))).head.getLong(0)
    val r = orders.join(customers.withColumnRenamed("c_custkey", "o_custkey"),
        Seq("o_custkey"), "left_semi")
      .agg(count(lit(1))).head
    val nTrue = r.getLong(0)
    val nProbe = orders.agg(count(lit(1))).head.getLong(0)
    import s.implicits._
    Seq((nProbe, nBitsSet, cand, nTrue, cand - nTrue))
      .toDF("n_probe", "n_bits_set", "n_candidates", "n_true", "n_false_pos")
  }

  val bloomJoinSql: String =
    """WITH bkeys AS (
      |  SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS k
      |  FROM customer WHERE c_mktsegment = 'BUILDING'),
      | salts AS (SELECT unnest(range(0, 4)) AS i),
      | occ AS (
      |  SELECT DISTINCT
      |    CAST('0x' || substr(md5(k || '#' || CAST(i AS VARCHAR)), 1, 10) AS BIGINT)
      |      % 1048576 AS pos
      |  FROM bkeys, salts),
      | pp AS (
      |  SELECT o_orderkey, o_custkey,
      |    CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || '#' || CAST(i AS VARCHAR)), 1, 10) AS BIGINT)
      |      % 1048576 AS pos
      |  FROM orders, salts),
      | hits AS (
      |  SELECT o_orderkey, count(*) AS nhit
      |  FROM pp JOIN occ USING (pos) GROUP BY 1),
      | cand AS (SELECT count(*) AS n_candidates FROM hits WHERE nhit = 4),
      | tm AS (
      |  SELECT count(*) AS n_true FROM orders
      |  WHERE o_custkey IN (SELECT c_custkey FROM customer
      |                      WHERE c_mktsegment = 'BUILDING'))
      |SELECT (SELECT count(*) FROM orders) AS n_probe,
      |  (SELECT count(*) FROM occ) AS n_bits_set,
      |  n_candidates, n_true,
      |  n_candidates - n_true AS n_false_pos
      |FROM cand, tm""".stripMargin
}
