package graft.ops

import graft.{QueryDef, Tables}
import graft.functions.Vec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (SURVEY.md §2).
  *
  * `ann_cosine` — brute-force cosine top-k: the correctness baseline.
  * Query set broadcast against the corpus; per-query top-k via
  * row_number. One scan of the corpus per batch of queries — at 100 TB
  * this is the "small query batch × huge corpus" shape, which is a
  * single broadcast-join pass (no corpus shuffle at all).
  *
  * `ann_lsh` — the scale path: random-hyperplane LSH buckets corpus
  * and queries (16 sign bits); candidates share a bucket; exact cosine
  * + top-k within candidates only. Hyperplanes are a deterministic ±1
  * closed form so the oracle derives identical buckets.
  */
object VectorOps {

  private val K = 10
  private val QueryFilter = "vec_id % 100 = 0"

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.fanout(Tables.load(s, dir, "embeddings"))
      .select(col("vec_id"), Vec.asDouble(col("embedding")).as("v"))

  def annCosine(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(expr(QueryFilter))
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        Vec.cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("qid"), col("cid"), round(col("cos"), 6).as("score"),
        col("rn"))
      .orderBy("qid", "rn")
  }

  val annCosineSql: String = s"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE $QueryFilter),
    pairs AS (
      SELECT q.qid, e.vec_id AS cid,
        list_dot_product(q.qv, e.v) /
          (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS cos
      FROM q CROSS JOIN e WHERE e.vec_id != q.qid),
    ranked AS (
      SELECT qid, cid, cos,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
      FROM pairs)
    SELECT qid, cid, ROUND(cos, 6) AS score, rn
    FROM ranked WHERE rn <= $K ORDER BY qid, rn"""

  val NPlanes = 16

  def annLsh(s: SparkSession, dir: String): DataFrame =
    annLshWith(s, dir, NPlanes)

  /** Plane count tunes the recall/candidate-count trade-off: fewer
    * planes → bigger buckets → higher recall, more exact work. */
  def annLshWith(s: SparkSession, dir: String, nPlanes: Int): DataFrame = {
    val e = emb(s, dir).withColumn("bucket", Vec.lshBucket(col("v"), nPlanes))
    val q = e.filter(expr(QueryFilter))
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("bucket").as("qbucket"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    e.join(broadcast(q),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        Vec.cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("qid"), col("cid"), round(col("cos"), 6).as("score"),
        col("rn"))
      .orderBy("qid", "rn")
  }

  val annLshSql: String = s"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (
      SELECT vec_id, v,
        CAST(list_sum(list_transform(generate_series(0, ${NPlanes - 1}), p ->
          CASE WHEN list_sum(list_transform(generate_series(0, len(v) - 1), j ->
              v[j + 1] * (CASE WHEN ((p * 7919 + j * 104729) % 97) % 2 = 0
                               THEN 1.0 ELSE -1.0 END))) >= 0
               THEN CAST(POW(2, p) AS BIGINT) ELSE 0 END)) AS BIGINT) AS bucket
      FROM e),
    q AS (SELECT vec_id AS qid, v AS qv, bucket AS qbucket FROM b WHERE $QueryFilter),
    pairs AS (
      SELECT q.qid, b.vec_id AS cid,
        list_dot_product(q.qv, b.v) /
          (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(b.v, b.v))) AS cos
      FROM q JOIN b ON b.bucket = q.qbucket AND b.vec_id != q.qid),
    ranked AS (
      SELECT qid, cid, cos,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
      FROM pairs)
    SELECT qid, cid, ROUND(cos, 6) AS score, rn
    FROM ranked WHERE rn <= $K ORDER BY qid, rn"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("ann_cosine", annCosine, Some(annCosineSql)),
    QueryDef("ann_lsh", annLsh, Some(annLshSql)))
}
