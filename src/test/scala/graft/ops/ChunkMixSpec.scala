package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkMixSpec extends SparkSpec {

  test("chunk_windows: full coverage, full-width interior windows") {
    val win = 64
    val stride = 48
    val chunks = Corpus.chunkWindows(spark, sfDir, win, stride).cache()
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))

    val per = chunks.groupBy("doc_id")
      .agg(max("win_id").as("last"), count(lit(1)).as("nw"),
        min("n_tok").as("min_tok"))
      .join(docs, Seq("doc_id"))
      .collect()
    assert(per.nonEmpty)
    per.foreach { r =>
      val (last, nw, n) = (r.getAs[Long]("last"), r.getAs[Long]("nw"),
        r.getAs[Int]("n"))
      assert(nw === last + 1, s"doc ${r.get(0)}: win_ids are 0..nw-1")
      val expected = if (n <= win) 1L
      else math.ceil((n - win).toDouble / stride).toLong + 1
      assert(nw === expected, s"doc ${r.get(0)}: window count for $n tokens")
      // last window start covers the document tail
      assert(stride * last + win >= n, s"doc ${r.get(0)}: tail covered")
    }
    // every non-last window is exactly `win` tokens wide
    val shortInterior = chunks.as("c")
      .join(chunks.groupBy("doc_id").agg(max("win_id").as("last")), Seq("doc_id"))
      .filter(col("win_id") < col("last") && col("n_tok") =!= win)
      .count()
    assert(shortInterior === 0L)
    chunks.unpersist()
  }

  test("corpus_epochs: budget conserved, caps respected, shares normalize") {
    val out = Corpus.corpusEpochs(spark, sfDir).collect()
    assert(out.nonEmpty)
    val totTok = out.map(_.getAs[Long]("n_tok")).sum
    val budget = 2L * totTok
    val alloc = out.map(_.getAs[Long]("toks_alloc")).sum
    // per-source floor loses < 1 token each; never exceeds the budget
    assert(alloc <= budget, s"allocated $alloc over budget $budget")
    // with no capped source the ideal allocations sum exactly to the
    // budget, so only the per-source floor (< 1 token each) is lost
    if (out.forall(_.getAs[Long]("capped") == 0L))
      assert(alloc >= budget - out.length,
        s"uncapped schedule left ${budget - alloc} tokens unscheduled")
    out.foreach { r =>
      val (n, e, a, c) = (r.getAs[Long]("n_tok"),
        r.getAs[Double]("epochs"), r.getAs[Long]("toks_alloc"),
        r.getAs[Long]("capped"))
      assert(e <= Corpus.EpochCap, s"${r.get(0)}: epochs $e over cap")
      assert(a <= (Corpus.EpochCap * n).toLong,
        s"${r.get(0)}: allocation exceeds cap*corpus")
      assert((c == 1L) == (e == Corpus.EpochCap),
        s"${r.get(0)}: capped flag inconsistent with epochs $e")
      assert(a >= 0L && r.getAs[Double]("share") > 0.0)
    }
    val shares = out.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-4, s"shares sum to $shares")
  }

  test("corpus_mix: smallest stratum kept whole, others downsampled to it") {
    val out = Corpus.corpusMix(spark, sfDir).collect()
    assert(out.length > 1)
    val minTotal = out.map(_.getAs[Long]("n_total")).min
    out.foreach { r =>
      val (nTotal, rate, nKept) = (r.getAs[Long]("n_total"),
        r.getAs[Double]("rate"), r.getAs[Long]("n_kept"))
      assert(rate === minTotal.toDouble / nTotal)
      assert(nKept <= nTotal)
      // hash-threshold sampling tracks the target rate (binomial
      // tolerance: 4 sigma at the stratum size)
      val sigma = math.sqrt(nTotal * rate * (1 - rate))
      assert(math.abs(nKept - rate * nTotal) <= 4 * sigma + 1,
        s"${r.getString(0)}: kept $nKept of $nTotal at rate $rate")
    }
  }
}
