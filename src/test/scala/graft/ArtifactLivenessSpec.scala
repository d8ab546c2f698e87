package graft

import org.apache.spark.storage.StorageLevel

/** The session-frozen index artifacts (IVF cells, PQ codebooks, PCA
  * state, graph edges/degrees, the incremental-dedup index, …) are
  * served from memos that LIVENESS-CHECK their pinned checkpoint
  * blocks and rebuild when anything unpersisted them. That rebuild
  * path is what stands between a stray `unpersist` (tests, an
  * explicit reset, external cache pressure) and
  * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — so it is certified here:
  * run an artifact consumer, drop EVERY persistent RDD in the
  * session (pinned ones included), run it again, and require the
  * identical answer. One consumer per artifact family.
  */
class ArtifactLivenessSpec extends SparkSpec {

  private def dropAllPersistentRdds(): Unit = {
    val sc = spark.sparkContext
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    assert(sc.getPersistentRDDs.values.forall(
      _.getStorageLevel == StorageLevel.NONE))
  }

  private val consumers: Seq[(String, () => Array[String])] = Seq(
    ("ivf coarse index (ann_ivf)",
      () => SparkEntry.queries("ann_ivf")(spark, sfDir)
        .collect().map(_.toString)),
    ("pq codebook+codes (ann_pq)",
      () => SparkEntry.queries("ann_pq")(spark, sfDir)
        .collect().map(_.toString)),
    ("ivf-pq residual layer (ann_ivf_pq)",
      () => SparkEntry.queries("ann_ivf_pq")(spark, sfDir)
        .collect().map(_.toString)),
    ("pca converged state (embed_abtt)",
      () => SparkEntry.queries("embed_abtt")(spark, sfDir)
        .collect().map(_.toString)),
    ("co-purchase edges + degrees (graph_assortativity)",
      () => SparkEntry.queries("graph_assortativity")(spark, sfDir)
        .collect().map(_.toString)),
    ("pagerank annotated adjacency (graph_pagerank)",
      () => SparkEntry.queries("graph_pagerank")(spark, sfDir)
        .collect().map(_.toString)),
    ("incremental-dedup existing-side index (dedup_incremental)",
      () => SparkEntry.queries("dedup_incremental")(spark, sfDir)
        .collect().map(_.toString)),
    ("tokenized corpus base table (text_tfidf)",
      () => SparkEntry.queries("text_tfidf")(spark, sfDir)
        .collect().map(_.toString)),
    ("bm25 per-term stats (text_bm25)",
      () => SparkEntry.queries("text_bm25")(spark, sfDir)
        .collect().map(_.toString)),
    ("synthetic multipolygon WKT corpus (geo_wkt_multipoly)",
      () => SparkEntry.queries("geo_wkt_multipoly")(spark, sfDir)
        .collect().map(_.toString)))

  for ((name, run) <- consumers)
    test(s"$name rebuilds and answers identically after its pinned " +
      "blocks are dropped") {
      val before = run()
      dropAllPersistentRdds()
      val after = run()
      assert(after.toSeq == before.toSeq,
        s"$name: post-rebuild answer diverges")
      assert(before.nonEmpty)
    }
}
