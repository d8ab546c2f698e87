package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERS: pair lists (dedup_minhash et al.) say which
  * documents overlap, but the pipeline decision — which single document
  * to keep — needs the connected components of that pair graph (a dup
  * of a dup of a dup is still the same cluster). This is the step that
  * turns "A~B, B~C" into "keep A, drop B and C".
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with its own id; each round every node takes the min of its
  * label and its neighbors' labels; fixpoint = per-component min id.
  * Each round is one shuffle (join + hash aggregate), and the round
  * count is the graph diameter — near-dup clusters are shallow (dup
  * families link through shared content), so this converges in a few
  * rounds. The per-round `Tables.hot` truncates lineage so round k+1
  * reads round k's blocks instead of recomputing the whole ladder.
  * (For adversarially deep graphs there are O(log d) contraction
  * schemes — large-star/small-star — but the extra machinery buys
  * nothing at near-dup shapes; the iteration cap fails loudly instead
  * of silently emitting half-merged clusters.)
  */
object DedupCluster {

  /** Connected components of an undirected edge list.
    *
    * @param edges (src, dst) pairs, any orientation, duplicates fine
    * @return (node, cluster_id) — cluster_id = min node id reachable
    */
  def connectedComponents(edges: DataFrame, maxIters: Int = 25): DataFrame = {
    val und = Tables.hot(
      edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst"))))
    var labels = Tables.hot(
      und.select(col("src").as("node")).distinct()
        .withColumn("lbl", col("node")))
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      // neighbor min per node, one shuffle (map-side combine on dst)
      val msgs = und.join(labels, col("src") === col("node"))
        .groupBy(col("dst").as("mnode")).agg(min("lbl").as("nlbl"))
      val next = Tables.hot(
        labels.join(msgs, col("node") === col("mnode"), "left")
          .select(col("node"),
            least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl")))
      converged = next
        .join(labels.withColumnRenamed("lbl", "prev"), Seq("node"))
        .filter(col("lbl") =!= col("prev"))
        .isEmpty
      labels = next
      it += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIters rounds — " +
        "graph diameter exceeds the cap; raise maxIters")
    labels
  }

  /** dedup_cluster: connected components of the verified minhash
    * near-dup pairs, with the canonical-keep decision (keep the min
    * doc_id of each cluster). Only documents that appear in at least
    * one near-dup pair are emitted — everything else is trivially its
    * own cluster. */
  def dedupCluster(s: SparkSession, dir: String): DataFrame = {
    val pairs = TextDedup.dedupMinhash(s, dir)
    val edges = pairs.select(col("da").as("src"), col("db").as("dst"))
    connectedComponents(edges)
      .select(col("node").cast("long").as("doc_id"),
        col("lbl").cast("long").as("cluster_id"))
      .withColumn("keep", col("doc_id") === col("cluster_id"))
      .orderBy("doc_id")
  }

  /** Oracle: the exact n-gram pairs at the same threshold (identical to
    * the minhash pairs — see TextDedup's LSH miss-probability note),
    * closed transitively with a recursive CTE, min id per component. */
  val dedupClusterSql: String = s"""
    WITH RECURSIVE pairs AS (${TextDedup.dedupNgramSql}),
    und AS (
      SELECT da AS src, db AS dst FROM pairs
      UNION ALL
      SELECT db AS src, da AS dst FROM pairs),
    reach AS (
      SELECT src, dst FROM und
      UNION
      SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src),
    lbl AS (
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(cluster_id AS BIGINT) AS cluster_id,
           doc_id = cluster_id AS keep
    FROM lbl ORDER BY doc_id"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("dedup_cluster", dedupCluster, Some(dedupClusterSql)))
}
