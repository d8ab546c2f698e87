package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contract specs for the round-6 sampling/selection wave (exact
  * values are pinned by the DuckDB oracle gate; these pin the
  * invariants that make the operators safe to rerun at scale). */
class SamplingSplitSpec extends SparkSpec {

  test("sample_reservoir: exactly k per stratum, equal to one global ranking") {
    val k = 7
    val out = Corpus.sampleReservoir(spark, sfDir, k = k)
    val perSource = out.groupBy("source").count().collect()
    assert(perSource.nonEmpty)
    assert(perSource.forall(_.getLong(1) == k.toLong),
      "every stratum larger than k must yield exactly k")
    // the two-level tournament must pick the same rows as the direct
    // single-window ranking it stands in for
    val w = Window.partitionBy("source")
      .orderBy(col("hk"), col("doc_id"))
    val direct = graft.Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("doc_id"),
        md5(concat(lit("rsv1:"), col("doc_id").cast("string"))).as("hk"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("source", "doc_id", "hk")
    assert(out.except(direct).isEmpty && direct.except(out).isEmpty,
      "tournament and single-window selections diverge")
  }

  test("text_hash_split: splits partition the corpus with sane mass") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val out = Corpus.textHashSplit(spark, sfDir).collect()
    val bySplit = out.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.values.sum == docs.count(), "splits must partition")
    val total = bySplit.values.sum.toDouble
    // hex bands 0d/1a out of 256 ≈ 5.1% each; generous tolerance at
    // 500 docs (binomial noise)
    assert(bySplit("train") / total > 0.8, s"train mass $bySplit")
    assert(bySplit.getOrElse("val", 0L) / total < 0.12, s"val mass $bySplit")
    assert(bySplit.getOrElse("test", 0L) / total < 0.12, s"test mass $bySplit")
  }

  test("text_heavy_hitters: MG guarantee holds even at tiny sketch capacity") {
    // k=2 forces constant eviction churn — the worst case for the
    // Misra–Gries guarantee. The output must STILL be exactly the
    // grams with global frequency > N/2 (here: none or a tiny set),
    // and at k=50 exactly those above N/50, both equal to the direct
    // exact computation.
    for (k <- Seq(2, 50)) {
      val got = Corpus.textHeavyHitters(spark, sfDir, k = k)
      val g = graft.Tables.load(spark, sfDir, "documents")
        .select(explode(graft.ops.Text.grams(3)).as("g"))
      val n = g.count().toDouble
      val want = g.groupBy("g").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > n / k)
      assert(got.drop("cnt").except(want.drop("cnt")).isEmpty &&
        want.drop("cnt").except(got.drop("cnt")).isEmpty,
        s"k=$k heavy-hitter sets diverge")
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"k=$k heavy-hitter counts diverge")
    }
  }

  test("sample_dsir: the target domain survives its own gate best") {
    val rows = Corpus.sampleDsir(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, k, _) => assert(k <= n) }
    val byKeepRate =
      rows.map { case (s, n, k, _) => s -> k.toDouble / n }.toMap
    // the op reports sum_logw + n_docs (no rounded mean — the ROUND
    // boundary rule); derive the mean here as a consumer would
    val byMean = rows.map { case (s, n, _, m) => s -> m / n }.toMap
    // the target source defines the target distribution — it must score
    // the highest mean log-ratio and survive the gate at the top rate
    assert(byMean("src0") == byMean.values.max,
      s"target mean not max: $byMean")
    assert(byKeepRate("src0") == byKeepRate.values.max,
      s"target keep rate not max: $byKeepRate")
  }

  test("dedup_keep_best: the kept doc is a longest member of its group") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(md5(col("text")).as("h"), col("doc_id"), col("n_chars"))
    val best = TextDedup.dedupKeepBest(spark, sfDir)
    // group sizes conserve the corpus
    assert(best.agg(sum("n")).head().getLong(0) == docs.count())
    // no group member is strictly longer than the keeper, and ties
    // never beat it with a smaller id
    val viol = best.join(docs, Seq("h"))
      .filter(docs("n_chars") > best("n_chars") ||
        (docs("n_chars") === best("n_chars") &&
          docs("doc_id") < best("keep_id")))
    assert(viol.isEmpty, "keep_best chose a dominated doc")
  }
}
