package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract specs for dedup_bloom and ann_ndcg (exact values are
  * pinned by the DuckDB oracle gate; these recompute the semantics
  * independently so a same-bug-both-engines slip cannot pass). */
class BloomNdcgSpec extends SparkSpec {

  private def r6(v: Double): Double =
    BigDecimal(java.math.BigDecimal.valueOf(v))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dedup_bloom matches a plain-Scala bloom recomputation; " +
    "no false negatives even at a saturated filter") {
    val m = 64 // tiny filter → forced false positives at sf0.001
    val rows = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bits(h: String): Seq[Long] = (1 to 3).map(j =>
      java.lang.Long.parseLong(md5hex(s"bloom$j:" + h).take(8), 16) % m)
    val (base, inc) = rows.partition { case (id, _, _) =>
      java.lang.Long.parseLong(
        md5hex("bsplit:" + id.toString).take(8), 16) % 4 != 0
    }
    val baseBits = base.flatMap(r => bits(md5hex(r._3))).toSet
    val baseH = base.map(r => md5hex(r._3)).toSet
    val want = inc.groupBy(_._2).map { case (src, docs) =>
      val f = docs.map { case (_, _, t) =>
        val h = md5hex(t)
        (bits(h).forall(baseBits), baseH.contains(h))
      }
      (src, docs.size.toLong, f.count(_._1).toLong, f.count(_._2).toLong,
        f.count(x => x._1 && !x._2).toLong)
    }.toSet
    val got = TextDedup.dedupBloom(spark, sfDir, m = m).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want, "bloom report diverges from the recompute")
    // accounting identity + zero false negatives, per source
    got.foreach { case (src, _, flagged, dup, fp) =>
      assert(flagged == dup + fp, s"$src: flagged != dup + fp")
    }
    // the tiny filter must actually exhibit false positives, or the
    // audit columns are untested
    assert(got.exists(_._5 > 0), "m=64 produced no false positives")
  }

  test("sample_hardneg: wrong-label only, ordered, and the mined top-1 " +
    "dominates every other wrong-label candidate") {
    val rows = VectorOps.sampleHardneg(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4), r.getInt(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, ql, _, cl, _, _) => assert(ql != cl) }
    val emb = graft.Tables.load(spark, sfDir, "embeddings").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map(x => x._1 * x._2).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val scores = rs.sortBy(_._6).map(_._5)
      assert(scores.sameElements(scores.sorted.reverse), s"q$qid unordered")
      val (_, qv, qlab) = emb.find(_._1 == qid).get
      val best = emb.filter(_._3 != qlab)
        .map(c => cos(qv, c._2)).max
      assert(math.abs(scores.head - best) < 1e-5,
        s"q$qid top negative is not the max wrong-label cosine")
    }
  }

  test("corpus_cluster_topics: ranked prefix of the full lift table, " +
    "support floor and per-cell ordering hold") {
    val top = VectorOps.corpusClusterTopics(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    val full = VectorOps.corpusClusterTopics(spark, sfDir, topK = 1000)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getDouble(4)))
    assert(top.nonEmpty)
    top.foreach { case (_, rn, _, n, _) =>
      assert(rn >= 1 && rn <= 3 && n >= 5)
    }
    top.groupBy(_._1).foreach { case (cell, rows) =>
      val lifts = rows.sortBy(_._2).map(_._5)
      assert(lifts.sameElements(lifts.sorted.reverse),
        s"cell $cell not ordered by lift")
    }
    // the registered top-3 is exactly the head of the full ranking
    assert(top.toSet == full.filter(_._2 <= 3).toSet,
      "top-3 is not a prefix of the full lift ranking")
  }

  test("ann_ndcg matches a plain-Scala NDCG recomputation of the lsh list") {
    val exact = VectorOps.annCosine(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap
    val lsh = VectorOps.annLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val idcg = (1 to 10).foldLeft(0.0)((a, i) =>
      a + r6((11.0 - i) / (math.log(i + 1.0) / math.log(2.0))))
    val want = lsh.groupBy(_._1).map { case (qid, cs) =>
      val dcg = cs.map { case (q, c, rn) =>
        val rel = 11.0 - exact.get((q, c)).map(_.toDouble).getOrElse(11.0)
        BigDecimal(java.math.BigDecimal.valueOf(
          r6(rel / (math.log(rn + 1.0) / math.log(2.0)))))
      }.sum.toDouble
      qid -> (dcg, r6(dcg / idcg))
    }
    val got = VectorOps.annNdcg(spark, sfDir).collect()
      .filter(_.getString(0) == "lsh")
      .map(r => r.getLong(1) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    assert(got == want, "lsh NDCG diverges from the recompute")
    got.values.foreach { case (_, n) =>
      assert(n >= 0.0 && n <= 1.0, s"ndcg out of range: $n")
    }
  }
}
