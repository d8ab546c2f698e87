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
      // `epochs` is ROUND(ideal/n_tok, 6) while `capped` compares the
      // UNROUNDED ratio: an uncapped ratio in [cap − 5e-7, cap) rounds
      // to exactly the cap with capped=0 — assert one-sided with a
      // rounding-width tolerance instead of exact iff
      if (c == 1L) assert(e == Corpus.EpochCap,
        s"${r.get(0)}: capped flag set but epochs $e below cap")
      else assert(e <= Corpus.EpochCap,
        s"${r.get(0)}: uncapped epochs $e above cap")
      if (e < Corpus.EpochCap - 1e-6) assert(c == 0L,
        s"${r.get(0)}: capped flag set at epochs $e well below cap")
      assert(a >= 0L && r.getAs[Double]("share") > 0.0)
    }
    val shares = out.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-4, s"shares sum to $shares")
  }

  test("pack_mixture: brute-force twin, not front-loaded, pipeline step agrees") {
    val out = Corpus.packMixture(spark, sfDir).collect()
    assert(out.nonEmpty)

    // ---- brute-force twin: replay the whole construction in plain
    // Scala (identical IEEE ops) and compare EXACTLY — no tolerances
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docRows = graft.Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val srcTok = docRows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val wq = srcTok.view.mapValues(t =>
      math.floor(math.sqrt(t.toDouble) * 1e6 + 0.5).toLong).toMap
    val budget = srcTok.values.sum * 2L
    val sumwq = wq.values.sum
    val sched = srcTok.map { case (src, t) =>
      val e = math.min(Corpus.EpochCap,
        budget.toDouble * wq(src) / sumwq / t)
      src -> (math.floor(e).toLong,
        math.floor((e - math.floor(e)) * 1152921504606846976L.toDouble).toLong)
    }
    val expected = scala.collection.mutable.Map
      .empty[(Long, String), (Long, Long, Double)]
    docRows.foreach { case (src, id, nt) =>
      val (full, thr) = sched(src)
      val h60 = java.lang.Long.parseLong(md5hex(s"mixk:$id").take(15), 16)
      val reps = full + (if (h60 < thr) 1L else 0L)
      (0L until reps).foreach { rep =>
        val h32 = java.lang.Long.parseLong(
          md5hex(s"mix:$id#$rep").take(8), 16)
        val k = (h32 / 67108864L, src)
        val (a, b, c) = expected.getOrElse(k, (0L, 0L, 0.0))
        expected(k) = (a + 1L, b + nt, c + h32.toDouble)
      }
    }
    assert(out.length == expected.size,
      s"group count ${out.length} vs twin ${expected.size}")
    out.foreach { r =>
      val k = (r.getAs[Long]("slice"), r.getAs[String]("source"))
      val (ni, ts, hs) = expected(k)
      assert(r.getAs[Long]("n_inst") == ni, s"$k: n_inst")
      assert(r.getAs[Long]("tok_sum") == ts, s"$k: tok_sum")
      assert(r.getAs[Double]("h_sum") == hs, s"$k: h_sum")
    }

    // ---- uniform ALONG the run: no source front-loads its instances
    // into the early slices (first-half mass within 5σ multinomial
    // tolerance of half — the property the hash-position interleave
    // exists to provide)
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val tot = rows.map(_.getAs[Long]("n_inst")).sum.toDouble
      val firstHalf = rows.filter(_.getAs[Long]("slice") < 32)
        .map(_.getAs[Long]("n_inst")).sum.toDouble
      assert(math.abs(firstHalf - tot / 2) <=
        5 * math.sqrt(tot * 0.25) + 1,
        s"$src: front-loaded (first half $firstHalf of $tot)")
    }

    // ---- the fluent chain step materializes the SAME instance set
    val viaPipeline = graft.api.CorpusPipeline(
        graft.Tables.load(spark, sfDir, "documents"))
      .packMixture().df
      .groupBy("slice", "source").agg(count(lit(1)).as("n_inst"))
      .collect()
      .map(r => (r.getAs[Long]("slice"), r.getAs[String]("source")) ->
        r.getAs[Long]("n_inst")).toMap
    assert(viaPipeline.size == out.length)
    out.foreach { r =>
      val k = (r.getAs[Long]("slice"), r.getAs[String]("source"))
      assert(viaPipeline(k) == r.getAs[Long]("n_inst"),
        s"pipeline step disagrees at $k")
    }
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

  test("pack_curriculum: exact partition, bands tight, quality " +
    "ascends along the run") {
    val out = Corpus.packCurriculum(spark, sfDir).collect()
    assert(out.nonEmpty)
    val d = graft.Tables.load(spark, sfDir, "documents")
      .select(size(split(col("text"), " ")).as("n")).collect()
    // every document lands in exactly one (stage, source) cell
    assert(out.map(_.getAs[Long]("n_docs")).sum === d.length.toLong)
    assert(out.map(_.getAs[Long]("tok_sum")).sum ===
      d.map(_.getAs[Int]("n").toLong).sum)
    // per-stage mean quality sits inside the stage's fractional band
    // (q6 rounds at 1e-6 — tolerance covers the half-step) and is
    // strictly ascending across non-empty stages: the curriculum ends
    // on the highest-quality data
    val byStage = out.groupBy(_.getAs[Int]("stage")).toSeq.sortBy(_._1)
    val means = byStage.map { case (st, rows) =>
      val nd = rows.map(_.getAs[Long]("n_docs")).sum
      val mean = rows.map(_.getAs[Long]("q_sum")).sum.toDouble / nd / 1e6
      assert(mean >= st / 8.0 - 1e-6 && mean <= (st + 1) / 8.0 + 1e-6,
        s"stage $st: mean quality $mean outside its band")
      mean
    }
    assert(means == means.sorted && means.distinct.size == means.size,
      s"stage means not strictly ascending: $means")
    // deterministic: a second run reproduces the audit bit-exactly
    // (pure md5 position hashes — no RNG state)
    val again = Corpus.packCurriculum(spark, sfDir).collect()
    assert(out.map(_.toString).sorted.toSeq ===
      again.map(_.toString).sorted.toSeq)
  }
}
