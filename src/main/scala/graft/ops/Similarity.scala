package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings.embedding: array<float>` (SURVEY.md
  * §2B): brute-force cosine top-k (the exactness baseline), exact
  * cosine near-dup pairs, and a random-hyperplane LSH bucketed variant
  * (the 100 TB path — candidates meet in an equi-join on 4-bit band
  * signatures instead of an all-pairs cross join).
  *
  * Math is done with Spark higher-order functions (`zip_with` +
  * `aggregate`) in double precision — codegen'd, no UDFs. The array fold
  * is index-ordered, so results are deterministic; ranks order by the
  * ROUNDED similarity with an id tiebreak so engine FP noise below the
  * rounding precision cannot reorder the oracle compare.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision over two float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-10 for a deterministic probe set (vec_id < 5)
    * against the whole corpus. Scale: the probe side is broadcast; the
    * corpus side streams — one narrow pass + per-query top-k via window
    * (rank over ≤|corpus| rows per query; for huge k·q use
    * TakeOrderedAndProject per group instead). */
  def cosineTopK(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val sims = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        round(cosine(col("qvec"), col("embedding")), 4).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 10)
      .orderBy(col("qid"), col("rank"))
  }

  val cosineTopKSql: String =
    """WITH ex AS (
      |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings),
      | norms AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM ex GROUP BY vec_id),
      | qx AS (SELECT * FROM ex WHERE vec_id < 5),
      | dots AS (
      |   SELECT q.vec_id AS qid, e.vec_id AS cid, sum(q.v * e.v) AS dp
      |   FROM qx q JOIN ex e ON q.i = e.i AND e.vec_id <> q.vec_id
      |   GROUP BY 1, 2),
      | sims AS (
      |   SELECT qid, cid, round(dp / (nq.nrm * nc.nrm), 4) AS cos
      |   FROM dots
      |   JOIN norms nq ON qid = nq.vec_id
      |   JOIN norms nc ON cid = nc.vec_id),
      | ranked AS (
      |   SELECT qid, cid, cos,
      |     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
      |   FROM sims)
      |SELECT qid, cid, cos, rank FROM ranked WHERE rank <= 10
      |ORDER BY qid, rank""".stripMargin

  /** Exact cosine near-duplicate pairs (≥ 0.45) — the embedding-space
    * dedup baseline. All-pairs by construction; kept as the verification
    * oracle for [[annLshPairs]], which is the plan you'd run at scale. */
  def cosinePairs(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val a = e.select(col("vec_id").as("id1"), col("embedding").as("v1"))
    val b = e.select(col("vec_id").as("id2"), col("embedding").as("v2"))
    a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(cosine(col("v1"), col("v2")), 4).as("cos"))
      .where(col("cos") >= 0.45)
      .orderBy(col("id1"), col("id2"))
  }

  val cosinePairsSql: String =
    """WITH ex AS (
      |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings),
      | norms AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM ex GROUP BY vec_id),
      | dots AS (
      |   SELECT a.vec_id AS id1, b.vec_id AS id2, sum(a.v * b.v) AS dp
      |   FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
      |   GROUP BY 1, 2)
      |SELECT id1, id2, round(dp / (n1.nrm * n2.nrm), 4) AS cos
      |FROM dots
      |JOIN norms n1 ON id1 = n1.vec_id
      |JOIN norms n2 ON id2 = n2.vec_id
      |WHERE round(dp / (n1.nrm * n2.nrm), 4) >= 0.45
      |ORDER BY id1, id2""".stripMargin

  /** Number of random hyperplanes (signature bits) and LSH bands. */
  val PLANES = 16
  val SIGN_BANDS = 4
  val BITS_PER_BAND: Int = PLANES / SIGN_BANDS

  /** Deterministic pseudo-random hyperplane component r[p][i] ∈ {−1,+1},
    * derived from xxhash64 so "training" is reproducible with no
    * driver-side state. */
  private def planeComponent(p: Int, dimIdx: Column): Column =
    when(xxhash64(lit(p), dimIdx).bitwiseAND(1) === 1, lit(1.0)).otherwise(lit(-1.0))

  /** Sign-bit p of a vector: sign(Σᵢ r[p][i]·vᵢ). */
  private def signBit(vec: Column, p: Int): Column = {
    val proj = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x.cast("double") * planeComponent(p, i)),
      lit(0.0), (acc, v) => acc + v)
    when(proj > 0, 1L).otherwise(0L)
  }

  /** ANN via random-hyperplane LSH: 16 sign bits per vector, split into
    * 4 bands of 4 bits; vectors sharing any band bucket become candidates
    * (equi-join on (band, bits)); candidates are verified with the exact
    * cosine. No cross join anywhere — this is the 100 TB plan shape.
    * Approximate by design (banding trades recall for candidate count) →
    * rows-only check; exactness oracle is [[cosinePairs]]. */
  def annLshPairs(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val sig = e.select(
      col("vec_id"), col("embedding"),
      array((0 until PLANES).map(p => signBit(col("embedding"), p)): _*).as("bits"))
    val banded = sig.select(
      col("vec_id"), col("embedding"),
      posexplode(array((0 until SIGN_BANDS).map { b =>
        concat_ws(",", (0 until BITS_PER_BAND).map(r => col("bits")(b * BITS_PER_BAND + r)): _*)
      }: _*)).as(Seq("band", "bucket")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        col("a.embedding").as("v1"), col("b.embedding").as("v2"))
      .distinct()
    cand
      .select(col("id1"), col("id2"),
        round(cosine(col("v1"), col("v2")), 4).as("cos"))
      .where(col("cos") >= 0.45)
      .orderBy(col("id1"), col("id2"))
  }

  /** IVF-style ANN: coarse-quantize the corpus to deterministic centroids
    * (every 100th vector), search only the probe's nearest cells.
    * The scale path when vectors live in many partitions: the centroid
    * table is tiny and broadcast twice (assignment + probe routing);
    * each query touches 1/|cells| of the corpus. Rows-only (cell routing
    * is engine-internal). */
  def ivfTopK(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val cent = e.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    // assign every vector to its nearest centroid (broadcast join + argmax)
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cent_id").asc)
    val assigned = e.join(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        cosine(col("embedding"), col("cvec")).as("csim"))
      .withColumn("rn", row_number().over(wAssign))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
    // probes = vec_id < 5; route each probe to its own cell, search there
    val probes = assigned.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"), col("cent_id").as("qcell"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
    assigned.join(broadcast(probes),
        col("cent_id") === col("qcell") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        round(cosine(col("qvec"), col("embedding")), 4).as("cos"))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= 10)
      .orderBy(col("qid"), col("rank"))
  }
}
