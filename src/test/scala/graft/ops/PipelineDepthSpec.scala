package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-8 LLM-pipeline depth: soft dedup, perplexity terciles, ABTT. */
class PipelineDepthSpec extends SparkSpec {

  test("dedup_soft: singletons always survive; kept within bounds") {
    val singles = Tables.load(spark, sfDir, "documents")
      .select(col("source"), md5(col("text")).as("k"))
      .groupBy("source", "k").agg(count(lit(1)).as("n"))
      .filter(col("n") === 1).groupBy("source").agg(count(lit(1)).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    TextDedup.dedupSoft(spark, sfDir).collect().foreach { r =>
      val src = r.getAs[String]("source")
      val (nDocs, nKept) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))
      assert(nKept <= nDocs)
      // a group of 1 has threshold 2^60, which every 60-bit hash clears
      assert(nKept >= singles.getOrElse(src, 0L),
        s"$src lost a singleton: kept=$nKept singles=${singles.get(src)}")
    }
  }

  test("text_ppl_bucket: buckets partition each source, ordered by nll") {
    val out = LangModel.textPplBucket(spark, sfDir).collect()
    val perSource = Tables.load(spark, sfDir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      assert(rows.map(_.getAs[Long]("n_docs")).sum == perSource(src))
      val byBucket = rows.map(r =>
        r.getAs[String]("bucket") -> r.getAs[Double]("mean_nll")).toMap
      for (h <- byBucket.get("head"); m <- byBucket.get("middle"))
        assert(h <= m + 1e-9, s"$src head > middle")
      for (m <- byBucket.get("middle"); t <- byBucket.get("tail"))
        assert(m <= t + 1e-9, s"$src middle > tail")
    }
  }

  test("winnowing guarantee: a shared 6-token run yields a shared fingerprint") {
    import spark.implicits._
    val shared = "q w e r t y" // k + w - 1 = 3 + 4 - 1 = 6 tokens
    val docs = Seq(
      (1L, s"a b c d $shared z x c v", "s1"),
      (2L, s"m n o $shared p l k j h g f", "s1"),
      (3L, "completely different tokens with no overlap at all here", "s1"))
      .toDF("doc_id", "text", "source")
    val fp = TextDedup.winnowFp(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](3).toSet).toMap
    assert((fp(1L) intersect fp(2L)).nonEmpty,
      "docs sharing >= k+w-1 tokens must share a fingerprint")
    assert((fp(1L) intersect fp(3L)).isEmpty)
    // selection density: fingerprints never exceed gram count
    val fps = TextDedup.winnowFp(
      graft.Tables.load(spark, sfDir, "documents")).collect()
    fps.foreach { r =>
      assert(r.getSeq[Long](3).size <= math.max(r.getAs[Int]("n_grams"), 1))
    }
  }

  test("q_fuzzy_match: pairs share the block, distances replay exactly") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val out = TextDedup.fuzzyMatch(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (a, b) = (r.getAs[String]("name_a"), r.getAs[String]("name_b"))
      assert(a.split(" ").head == b.split(" ").head, "blocking violated")
      assert(r.getAs[Long]("d") == lev(a, b).toLong, s"distance($a, $b)")
      assert(r.getAs[Long]("d") <= 3)
    }
  }

  test("q_k_anonymity: exposure bounded and internally consistent") {
    val r = Privacy.kAnonymity(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_exposed") <= r.getAs[Long]("n_rows"))
    assert(r.getAs[Long]("n_risky_classes") <= r.getAs[Long]("n_classes"))
    assert(r.getAs[Long]("min_class") >= 1)
    val rate = r.getAs[Double]("exposure_rate")
    assert(rate >= 0.0 && rate <= 1.0)
  }

  test("dedup_minhash_est: estimates calibrated within estimator variance") {
    val out = TextDedup.dedupMinhashEst(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (j, est, err) = (r.getAs[Double]("jacc"),
        r.getAs[Double]("est_jacc"), r.getAs[Double]("err"))
      assert(est >= 0.0 && est <= 1.0)
      assert(math.abs(est - j - err) < 1e-6)
      val sd = math.sqrt(j * (1 - j) / 32)
      assert(math.abs(err) <= 5 * sd + 1.0 / 32 + 1e-9,
        s"estimator out of calibration: j=$j est=$est")
    }
  }

  test("sample_temperature: smallest source keeps all, rates soften counts") {
    val out = Corpus.sampleTemperature(spark, sfDir).collect()
    assert(out.nonEmpty)
    val minDocs = out.map(_.getAs[Long]("n_docs")).min
    out.foreach { r =>
      val (n, rate, kept) = (r.getAs[Long]("n_docs"),
        r.getAs[Double]("rate"), r.getAs[Long]("n_kept"))
      assert(rate > 0.0 && rate <= 1.0)
      if (n == minDocs) assert(kept == n, "smallest source must keep all")
      // a 60-bit uniform vs rate threshold: kept within +-5 sigma of n*rate
      val sd = math.sqrt(n * rate * (1 - rate))
      assert(math.abs(kept - n * rate) <= 5 * sd + 1,
        s"${r.getAs[String]("source")}: kept=$kept expected ~${n * rate}")
    }
  }

  test("chunk_cdc: a head insertion re-chunks only its neighborhood") {
    import spark.implicits._
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, text, "s"), (2L, "INSERTED " + text, "s"))
      .toDF("doc_id", "text", "source")
    val ch = Corpus.cdcChunks(docs).collect()
    val byDoc = ch.groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[String]("ctext")).toSet).toMap
    val shared = (byDoc(1L) intersect byDoc(2L)).size.toDouble / byDoc(1L).size
    assert(shared > 0.7,
      s"content-defined boundaries must localize the edit (shared=$shared)")
    // chunks reassemble the document exactly
    val rebuilt = ch.filter(_.getAs[Long]("doc_id") == 1L)
      .sortBy(_.getAs[Long]("cid")).map(_.getAs[String]("ctext"))
      .mkString(" ")
    assert(rebuilt == text)
  }

  test("embed_abtt: residual variance bounded by total, fraction in [0,1)") {
    val out = VectorOps.embedAbtt(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (vt, vr, f) = (r.getAs[Double]("var_total"),
        r.getAs[Double]("var_resid"), r.getAs[Double]("removed_frac"))
      assert(vr >= -1e-9 && vr <= vt + 1e-9)
      assert(f >= -1e-9 && f < 1.0)
    }
  }
}
