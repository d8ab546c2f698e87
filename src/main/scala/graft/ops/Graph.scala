package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph reachability — the engine answer to SQL's
  * WITH RECURSIVE (org charts, BOM explosions, referrer chains),
  * which Spark does not ship. The Spark-first shape is pointer
  * DOUBLING: each round self-joins the frontier so the followed
  * distance doubles — O(log depth) shuffles total instead of
  * O(depth), the difference between 5 rounds and 40 at a realistic
  * hierarchy. Same driver-coordinated-rounds contract as the
  * dedup_cluster CC loop: per-round lineage truncation
  * (Tables.hot), loud failure if the cap is hit.
  */
object Graph {

  /** Per-node depth to the root of a deterministic binary hierarchy
    * (parent(k) = k DIV 2, root 1) derived from customer keys — the
    * oracle replays it as a WITH RECURSIVE parent walk. */
  def transitiveDepth(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.fanout(Tables.load(s, dir, "customer"))
      .select(col("c_custkey").as("id"))
    // state (id, anc, d): anc is the farthest ancestor followed so
    // far, d the edge count to it; fixed point = anc is the root
    var st = Tables.hot(base.select(col("id"),
      when(col("id") > 1, expr("id DIV 2")).otherwise(lit(1L)).as("anc"),
      when(col("id") === 1, lit(0L)).otherwise(lit(1L)).as("d")))
    var rounds = 0
    var open = st.filter(col("anc") =!= 1).count()
    while (open > 0 && rounds < 12) {
      // doubling jump: follow anc's own (anc, d) in one equi-join —
      // the root's state (1, 1, 0) is the natural fixed point
      val jumped = st.as("a")
        .join(st.as("b"), col("a.anc") === col("b.id"))
        .select(col("a.id"), col("b.anc").as("anc"),
          (col("a.d") + col("b.d")).as("d"))
      st = Tables.hot(jumped)
      rounds += 1
      open = st.filter(col("anc") =!= 1).count()
    }
    require(open == 0,
      s"transitive closure did not converge in $rounds doubling rounds " +
        s"($open open) — depth > 2^$rounds implies a cycle or bad edges")
    st.select(col("id"), col("d").as("depth")).orderBy("id")
  }

  val transitiveDepthSql: String = """
    WITH RECURSIVE walk(id, anc, d) AS (
      SELECT c_custkey,
             CASE WHEN c_custkey > 1 THEN c_custkey // 2 ELSE 1 END,
             CASE WHEN c_custkey = 1 THEN 0 ELSE 1 END
      FROM customer
      UNION ALL
      SELECT id, CASE WHEN anc > 1 THEN anc // 2 ELSE 1 END, d + 1
      FROM walk WHERE anc > 1)
    SELECT id, CAST(d AS BIGINT) AS depth
    FROM walk WHERE anc = 1 ORDER BY id"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_transitive", transitiveDepth, Some(transitiveDepthSql)))
}
