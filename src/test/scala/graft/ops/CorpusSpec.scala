package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant specs for the corpus-assembly wave (exact values are
  * covered by the DuckDB oracle gate; these pin the semantic
  * contracts that survive any corpus). */
class CorpusSpec extends SparkSpec {

  test("pack_shards: shards are contiguous and respect the token budget") {
    val budget = 2000
    val shards = Corpus.packShards(spark, sfDir, budget).collect()
    assert(shards.nonEmpty)
    shards.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.head == 0L, "first shard of each source is 0")
      assert(ids.zip(ids.tail).forall { case (a, b) => b == a + 1 },
        "shard ids are contiguous per source")
      // every shard starts before the budget line it closes on: its
      // token sum can overshoot by at most one document, so any shard
      // except the last must have crossed the budget boundary
      rows.sortBy(_.getLong(1)).dropRight(1).foreach { r =>
        assert(r.getLong(3) > 0, "non-empty shard")
      }
    }
    // total docs conserved
    val total = shards.map(_.getLong(2)).sum
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(total == docs)
  }

  test("sample_stratified: kept counts within binomial bounds per stratum") {
    val rows = Corpus.sampleStratified(spark, sfDir).collect()
    rows.foreach { r =>
      val (lang, total, kept) =
        (r.getString(0), r.getLong(1), r.getLong(2))
      val rate = if (lang == "en") 0x29.toDouble / 256 else 0x80.toDouble / 256
      val sd = math.sqrt(total * rate * (1 - rate))
      assert(math.abs(kept - total * rate) < 5 * sd + 1,
        s"$lang kept=$kept of $total, expected ~${total * rate}")
    }
  }

  test("text_scrub: redaction changes the hash exactly when there are hits") {
    val d = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), md5(col("text")).as("orig_h"))
    val joined = Corpus.textScrub(spark, sfDir)
      .join(d, "doc_id")
      .select(col("n_hits"), (col("clean_h") === col("orig_h")).as("same"))
      .collect()
    assert(joined.exists(_.getInt(0) > 0), "denylist terms occur in corpus")
    joined.foreach { r =>
      assert((r.getInt(0) == 0) == r.getBoolean(1),
        "hash unchanged iff zero hits")
    }
  }

  test("text_entropy: bounded by ln(n_tokens), uniform docs hit the bound") {
    import spark.implicits._
    val e = Corpus.textEntropy(spark, sfDir)
      .join(graft.Tables.load(spark, sfDir, "documents"), "doc_id")
      .select(col("entropy"), size(split(col("text"), " ")).as("n"))
      .as[(Double, Int)].collect()
    e.foreach { case (h, n) =>
      // entropy is rounded to 6 dp, so the upper bound loosens by 5e-7
      assert(h >= -1e-6 && h <= math.log(n) + 1e-6, s"0 <= $h <= ln($n)")
    }
    // a document of all-distinct tokens has entropy exactly ln(n)
    Seq((1L, "a b c d")).toDF("doc_id", "text")
      .createOrReplaceTempView("uniform_doc")
    val one = spark.sql(
      """SELECT doc_id, text FROM uniform_doc""")
    val h = one.select(explode(split(col("text"), " ")).as("w"), col("doc_id"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg((log(sum(col("c")).cast("double")) -
        sum(col("c").cast("double") * log(col("c").cast("double"))) /
          sum(col("c")).cast("double")).as("h"))
      .head().getDouble(1)
    assert(math.abs(h - math.log(4)) < 1e-12)
  }

  test("corpus_zipf: slope/R2 match a plain-Scala OLS recomputation") {
    def r(v: Double, s: Int): BigDecimal =
      BigDecimal(java.math.BigDecimal.valueOf(v))
        .setScale(s, BigDecimal.RoundingMode.HALF_UP)
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("source", "text").collect()
      .map(x => (x.getString(0), x.getString(1).split(" ").filter(_.nonEmpty)))
    val want = docs.groupBy(_._1).map { case (src, ds) =>
      val freq = ds.flatMap(_._2).groupBy(identity)
        .map { case (w, xs) => w -> xs.length }.toSeq
        .sortBy { case (w, f) => (-f, w) }.take(1000)
      val pts = freq.zipWithIndex.map { case ((_, f), i) =>
        (r(math.log(i + 1.0), 6).toDouble, r(math.log(f.toDouble), 6).toDouble)
      }
      val n = pts.size.toDouble
      val sx = pts.map(p => r(p._1, 6)).sum.toDouble
      val sy = pts.map(p => r(p._2, 6)).sum.toDouble
      val sxx = pts.map(p => r(p._1 * p._1, 12)).sum.toDouble
      val syy = pts.map(p => r(p._2 * p._2, 12)).sum.toDouble
      val sxy = pts.map(p => r(p._1 * p._2, 12)).sum.toDouble
      val slope = r((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).toDouble
      val r2 = r((n * sxy - sx * sy) * (n * sxy - sx * sy)
        / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6).toDouble
      (src, pts.size.toLong, slope, r2)
    }.toSet
    val got = Corpus.corpusZipf(spark, sfDir).collect().map(x =>
      (x.getString(0), x.getLong(1), x.getDouble(2), x.getDouble(3))).toSet
    assert(got == want, "zipf OLS diverges from the recompute")
  }
}
