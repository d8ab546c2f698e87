package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract specs for the retrieval/gating wave (exact values are
  * pinned by the DuckDB oracle gate; these recompute the math
  * independently in plain Scala so a same-bug-both-engines slip in
  * the Spark/SQL twins cannot pass silently). */
class RetrievalSpec extends SparkSpec {

  private def r6(v: Double): Double =
    BigDecimal(java.math.BigDecimal.valueOf(v))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val docRows: Seq[(Long, String, Array[String])] =
    graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ")))
      .toSeq

  test("text_bm25: scores match a plain-Scala BM25 recomputation") {
    val q = Seq("spark", "join", "window", "vector")
    val n = docRows.size.toDouble
    val avgdl = docRows.map(_._3.length.toLong).sum.toDouble / n
    val dfm = q.map(t => t -> docRows.count(_._3.contains(t))).toMap
    def score(toks: Array[String]): (Long, Double) = {
      val dl = toks.length
      val hits = q.filter(t => toks.contains(t))
      val s = hits.map { t =>
        val tf = toks.count(_ == t)
        val idf6 = r6(math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0))
        r6(idf6 * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))))
      }.map(v => BigDecimal(java.math.BigDecimal.valueOf(v)))
        .sum.toDouble
      (hits.size.toLong, s)
    }
    val want = docRows.map { case (id, _, t) => id -> score(t) }
      .filter(_._2._1 > 0)
      .sortBy { case (id, (_, s)) => (-s, id) }.take(20)
    val got = Retrieval.textBm25(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want, "BM25 top-20 diverges from the recompute")
  }

  test("rank_fusion: rrf6 is exactly 1/(60+r) summed over present lists") {
    val rows = Retrieval.rankFusion(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ra = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val rb = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(ra.isDefined || rb.isDefined, "fused doc in neither list")
      val want = r6(ra.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rb.map(x => 1.0 / (60 + x)).getOrElse(0.0))
      assert(r.getDouble(3) == want, s"rrf mismatch at doc ${r.getLong(0)}")
    }
    // both lists contribute: at least one fused doc from each side only
    assert(rows.exists(_.isNullAt(1)) || rows.exists(!_.isNullAt(2)),
      "dense list never contributes")
    val fused = rows.map(_.getDouble(3))
    assert(fused.sameElements(fused.sortBy(-_)), "not ordered by rrf6")
  }

  test("text_gopher: rule counts match a plain-Scala recomputation") {
    val stops = Set("the", "a", "of", "and", "to", "in")
    case class V(nw: Boolean, ml: Boolean, st: Boolean, al: Boolean,
                 sy: Boolean) {
      def keep: Boolean = !nw && !ml && !st && !al && !sy
    }
    val per = docRows.map { case (_, src, t) =>
      val dl = t.length
      val wc = t.map(_.length.toLong).sum
      src -> V(dl < 50 || dl > 100000,
        wc < 3L * dl || wc > 10L * dl,
        t.toSet.intersect(stops).size < 2,
        5L * t.count(_.exists(_.isLetter)) < 4L * dl,
        10L * t.count(w => w == "#" || w == "...") > dl)
    }
    val want = per.groupBy(_._1).map { case (src, vs) =>
      val v = vs.map(_._2)
      (src, v.size.toLong, v.count(_.nw).toLong, v.count(_.ml).toLong,
        v.count(_.st).toLong, v.count(_.al).toLong, v.count(_.sy).toLong,
        v.count(_.keep).toLong)
    }.toSet
    val got = Retrieval.textGopher(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got == want, "gopher report diverges from the recompute")
  }

  test("CorpusPipeline.gopherFilter keeps exactly the report's n_keep " +
    "docs per source") {
    val kept = graft.api.CorpusPipeline(
        graft.Tables.load(spark, sfDir, "documents"))
      .gopherFilter().df
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val report = Retrieval.textGopher(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(7)).filter(_._2 > 0).toMap
    assert(report.nonEmpty)
    assert(kept == report, "pipeline step and report keep sets diverge")
  }

  test("mm_align: per-source report matches a plain-Scala recomputation") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(w: String): Int = {
      val h = md.digest(("clip:" + w).getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(h, 16) % 64).toInt
    }
    val per = docRows.flatMap { case (id, src, t) =>
      emb.get(id).map { v =>
        val cnts = t.groupBy(bucket).map { case (b, ws) => b -> ws.length }
        // qsum128 at scale 6: Σ floor(x·1e6 + 0.5) longs, then /1e6
        val sq = cnts.map { case (b, c) =>
          math.floor(c * v(b) * 1e6 + 0.5).toLong }.sum / 1e6
        val c2 = cnts.values.map(c => c.toLong * c).sum
        val e2 = v.map(x => x * x).sum
        val cos6 = r6(sq / (math.sqrt(c2.toDouble) * math.sqrt(e2)))
        (src, cos6)
      }
    }
    val want = per.groupBy(_._1).map { case (src, xs) =>
      (src, xs.size.toLong, xs.count(_._2 > 0.0).toLong,
        xs.map(x => BigDecimal(java.math.BigDecimal.valueOf(x._2)))
          .sum.toDouble)
    }.toSet
    val got = Retrieval.mmAlign(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want, "mm_align report diverges from the recompute")
  }
}
