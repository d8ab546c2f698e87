package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupClusterSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chain, isolated pair, triangle") {
    // chain 1-2-3-4-5 (diameter 4 — needs several propagation rounds),
    // isolated pair 10-11, triangle 20-21-22 (one edge redundant)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("src", "dst")
    val got = DedupCluster.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components: reversed orientation gives the same labels") {
    val fwd = Seq((1L, 7L), (7L, 9L)).toDF("src", "dst")
    val rev = Seq((9L, 7L), (7L, 1L)).toDF("src", "dst")
    val a = DedupCluster.connectedComponents(fwd)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = DedupCluster.connectedComponents(rev)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a === b)
    assert(a === Seq((1L, 1L), (7L, 1L), (9L, 1L)))
  }

  test("dedup_cluster keeps exactly one document per cluster") {
    val out = DedupCluster.dedupCluster(spark, sfDir).cache()
    val perCluster = out.groupBy("cluster_id")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("n_keep"),
        min("doc_id").as("min_doc"))
      .collect()
    assert(perCluster.nonEmpty)
    perCluster.foreach { r =>
      assert(r.getLong(1) === 1L, s"cluster ${r.getLong(0)}: one keeper")
      assert(r.getLong(0) === r.getLong(2), "cluster id is the min member")
    }
    out.unpersist()
  }

  test("corpus_near_dedup: survivors = one per near-dup group") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val nDocs = docs.count()
    val lbl = DedupCluster.dedupCluster(spark, sfDir)
      .select("doc_id", "cluster_id")
    val nGroups = docs.join(lbl, Seq("doc_id"), "left")
      .select(coalesce(col("cluster_id"), col("doc_id")).as("grp"))
      .distinct().count()
    val report = DedupCluster.corpusNearDedup(spark, sfDir).collect()
    val totDocs = report.map(_.getLong(1)).sum
    val totKept = report.map(_.getLong(2)).sum
    assert(totDocs == nDocs, "report must cover every document")
    assert(totKept == nGroups,
      s"one survivor per group: kept=$totKept groups=$nGroups")
    report.foreach(r => assert(r.getLong(2) <= r.getLong(1) &&
      r.getLong(3) >= 0L))
  }

  test("corpus_semantic_dedup: one keeper per semantic cluster, " +
    "keeper has the cluster's max quantized norm") {
    val e = graft.Tables.load(spark, sfDir, "embeddings")
    val nVecs = e.count()
    val pairs = VectorOps.dedupEmbedIvf(spark, sfDir)
      .select(col("da").as("src"), col("db").as("dst"))
    val nGroups = e.join(
        DedupCluster.connectedComponents(pairs)
          .select(col("node").as("vec_id"), col("lbl").as("cluster_id")),
        Seq("vec_id"), "left")
      .select(coalesce(col("cluster_id"), col("vec_id")).as("grp"))
      .distinct().count()
    val report = DedupCluster.corpusSemanticDedup(spark, sfDir).collect()
    assert(report.map(_.getLong(1)).sum == nVecs,
      "report must cover every vector")
    assert(report.map(_.getLong(2)).sum == nGroups,
      "exactly one keeper per semantic cluster")
    report.foreach(r =>
      assert(r.getLong(2) + r.getLong(3) == r.getLong(1)))
  }
}
