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
