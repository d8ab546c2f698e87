package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSubstringsSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], w: Int) =
    Corpus.substringDedupCore(
      docs.toDF("doc_id", "text"), w)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  private def md5Of(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("a duplicate span straddling a 10-token block edge is removed " +
    "here and invisible to block-grain dedup") {
    // doc 0: 60 unique tokens a0..a59. doc 1: 7 unique prefix tokens,
    // then doc 0's tokens a5..a54 (a 50-token shared run), then 3 more.
    // The run starts at offset 5 in doc 0 and offset 7 in doc 1 — it
    // straddles every 10-token block boundary ON BOTH SIDES with
    // different alignments, so no fixed 10-token block repeats and
    // dedup_paragraphs finds nothing; stride-1 windows catch it.
    val a = (0 until 60).map(i => s"a$i")
    val shared = a.slice(5, 55)
    val doc1 = (0 until 7).map(i => s"b$i") ++ shared ++
      (0 until 3).map(i => s"c$i")
    val out = run(Seq(0L -> a.mkString(" "), 1L -> doc1.mkString(" ")), 50)
    assert(out(0L) == ((60L, 0L, md5Of(a.mkString(" ")))))
    val kept1 = (0 until 7).map(i => s"b$i") ++ (0 until 3).map(i => s"c$i")
    assert(out(1L) == ((60L, 50L, md5Of(kept1.mkString(" ")))))

    // block-grain dedup on the same pair would find NOTHING: no
    // aligned 10-token block repeats (dedup_paragraphs' exact grain)
    val t0 = a.grouped(10).map(_.mkString(" ")).toSet
    val t1 = doc1.grouped(10).map(_.mkString(" ")).toSet
    assert(t0.intersect(t1).isEmpty,
      "fixture must not share any aligned 10-token block")
  }

  test("overlapping duplicate windows merge into one span; first " +
    "occurrence kept; short docs untouched") {
    // doc 0 holds a 12-token motif twice (positions 0 and 20) with
    // unique filler between; w=10 → three duplicate windows at the
    // second occurrence (starts 20,21,22) merging into tokens 20..31
    val motif = (0 until 12).map(i => s"m$i")
    val fill = (0 until 8).map(i => s"f$i")
    val tail = (0 until 10).map(i => s"t$i")
    val d0 = motif ++ fill ++ motif ++ tail
    val short = Seq("x0", "x1", "x2")
    val out = run(Seq(0L -> d0.mkString(" "), 1L -> short.mkString(" ")), 10)
    val kept0 = motif ++ fill ++ tail
    assert(out(0L) == ((42L, 12L, md5Of(kept0.mkString(" ")))))
    assert(out(1L) == ((3L, 0L, md5Of(short.mkString(" ")))))
  }

  test("CorpusPipeline.dedupSubstrings rebuilds exactly what the " +
    "certified report op certifies") {
    // crafted corpus with a cross-doc 12-token shared span at w=10
    // plus an untouched short doc; the fluent step's rebuilt text must
    // hash to the report op's oracle-certified rebuilt_md5 per doc
    val motif = (0 until 12).map(i => s"m$i")
    val docs = Seq(
      (0L, (motif ++ (0 until 8).map(i => s"a$i")).mkString(" ")),
      (1L, ((0 until 5).map(i => s"b$i") ++ motif).mkString(" ")),
      (2L, "tiny doc untouched"))
      .toDF("doc_id", "text")
    val stepped = graft.api.CorpusPipeline(docs).dedupSubstrings(10).df
      .select(col("doc_id"), md5(col("text")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val certified = Corpus.substringDedupCore(docs, 10)
      .select(col("doc_id"), col("rebuilt_md5"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stepped == certified)
    // and the dup really was removed from doc 1, not doc 0
    assert(stepped(1L) == md5Of((0 until 5).map(i => s"b$i").mkString(" ")))
  }

  test("cross-op invariant: every token dedup_paragraphs drops in a " +
    "FULL block is also dropped by dedup_substrings at w=10") {
    // a non-canonical duplicated aligned block implies the identical
    // 10-token window exists at a smaller (doc_id, pos), so the window
    // at the block is non-canonical too and covers all 10 tokens.
    // (Tail partial blocks < 10 tokens have no window — use documents
    // whose lengths are multiples of 10 so every block is full.)
    val blk = (c: Char, k: Int) => (0 until 10).map(i => s"$c$k$i")
    val docs = Seq(
      0L -> (blk('a', 0) ++ blk('a', 1) ++ blk('a', 2)),
      1L -> (blk('b', 0) ++ blk('a', 1) ++ blk('b', 2)), // middle block dup
      2L -> (blk('a', 0) ++ blk('a', 0) ++ blk('c', 0))) // self-repeat
      .map { case (id, t) => (id, t.mkString(" ")) }
      .toDF("doc_id", "text")
    val sub = Corpus.substringDedupCore(docs, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // block-grain drops, replicated at the spec level (aligned blocks,
    // canonical = smallest (doc_id, block_pos))
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val blocks = rows.flatMap { case (id, t) =>
      t.split(" ").grouped(10).zipWithIndex.map { case (b, p) =>
        (b.mkString(" "), id, p) }
    }
    val canon = blocks.groupBy(_._1).map { case (c, occ) =>
      c -> occ.map(o => (o._2, o._3)).min }
    val paraDropped = blocks.groupBy(_._2).map { case (id, bs) =>
      id -> bs.count(b => canon(b._1) != ((b._2, b._3))) * 10L }
    paraDropped.foreach { case (id, pd) =>
      assert(sub(id) >= pd,
        s"doc $id: substrings dropped ${sub(id)} < block-grain $pd")
    }
    assert(paraDropped.values.sum > 0, "fixture must drop something")
  }

  test("cross-doc duplicate keeps the smaller (doc_id, pos) occurrence") {
    val s = (0 until 10).map(i => s"s$i")
    val d0 = Seq("u0", "u1") ++ s             // occurrence at (0, 2)
    val d1 = s ++ Seq("v0", "v1")             // occurrence at (1, 0)
    val out = run(Seq(0L -> d0.mkString(" "), 1L -> d1.mkString(" ")), 10)
    assert(out(0L)._2 == 0L)
    assert(out(1L) == ((12L, 10L, md5Of(Seq("v0", "v1").mkString(" ")))))
  }

  // ---- text_decontam_span (the benchmark-vs-corpus variant) ----------

  private def runSpan(bench: Seq[(Long, String)],
                      corpus: Seq[(Long, String)], w: Int) = {
    val bw = Corpus.substringWindows(bench.toDF("doc_id", "text"), w)
      .select("h1", "h2").distinct()
    Corpus.decontamSpanCore(bw, corpus.toDF("doc_id", "text"), w)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
  }

  test("decontam span: a >= w-token benchmark overlap is excised " +
    "surgically; a (w-1)-token overlap is untouched") {
    val w = 25
    val bench = (0 until 40).map(i => s"x$i")
    // corpus doc 0: 5 unique + bench tokens x5..x34 (a 30-token shared
    // run) + 5 unique. Hit windows start at corpus pos 5..10 (each
    // must lie fully inside the run), coverage merges to pos 5..34.
    val c0 = (0 until 5).map(i => s"u$i") ++ bench.slice(5, 35) ++
      (0 until 5).map(i => s"v$i")
    // corpus doc 1: shares only 24 consecutive tokens — no 25-window
    // fits inside the overlap, so span-grain finds NOTHING (while
    // 5-gram flag decontam would discard the whole doc)
    val c1 = (0 until 6).map(i => s"w$i") ++ bench.slice(0, 24) ++
      (0 until 6).map(i => s"y$i")
    val out = runSpan(Seq(9000L -> bench.mkString(" ")),
      Seq(0L -> c0.mkString(" "), 1L -> c1.mkString(" ")), w)
    val kept0 = (0 until 5).map(i => s"u$i") ++ (0 until 5).map(i => s"v$i")
    assert(out(0L) == ((40L, 30L, md5Of(kept0.mkString(" ")))))
    assert(out(1L) == ((36L, 0L, md5Of(c1.mkString(" ")))))
  }

  test("decontam span: a verbatim benchmark copy is fully removed; " +
    "two disjoint hits cover independently") {
    val w = 10
    val b0 = (0 until 15).map(i => s"p$i")
    val b1 = (0 until 12).map(i => s"q$i")
    // doc 0 IS b0 — every token covered, rebuild is the empty string
    // doc 1 embeds both benchmark docs with unique filler between:
    // two disjoint excisions in one document
    val c1 = b0 ++ (0 until 5).map(i => s"f$i") ++ b1 ++ Seq("z0")
    val out = runSpan(
      Seq(9000L -> b0.mkString(" "), 9001L -> b1.mkString(" ")),
      Seq(0L -> b0.mkString(" "), 1L -> c1.mkString(" ")), w)
    assert(out(0L) == ((15L, 15L, md5Of(""))))
    val kept1 = (0 until 5).map(i => s"f$i") ++ Seq("z0")
    assert(out(1L) == ((33L, 27L, md5Of(kept1.mkString(" ")))))
  }

  test("CorpusPipeline.decontamSpan rebuilds exactly what the " +
    "certified report op certifies") {
    import org.apache.spark.sql.functions.{col, md5}
    val w = 10
    val b = (0 until 14).map(i => s"k$i")
    val bench = Seq(9000L -> b.mkString(" ")).toDF("doc_id", "text")
    val corpus = Seq(
      0L -> ((0 until 4).map(i => s"a$i") ++ b).mkString(" "),
      1L -> "short doc untouched",
      2L -> (b.take(9) ++ Seq("zz")).mkString(" ")) // 9 < w: no hit
      .toDF("doc_id", "text")
    val stepped = graft.api.CorpusPipeline(corpus).decontamSpan(bench, w)
      .df.select(col("doc_id"), md5(col("text")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bw = Corpus.substringWindows(bench, w).select("h1", "h2").distinct()
    val certified = Corpus.decontamSpanCore(bw, corpus, w)
      .select(col("doc_id"), col("rebuilt_md5"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stepped == certified)
    assert(stepped(0L) == md5Of((0 until 4).map(i => s"a$i").mkString(" ")))
    assert(stepped(2L) == md5Of((b.take(9) ++ Seq("zz")).mkString(" ")))
  }

  test("decontam span vs flag decontam: span hits imply 5-gram flags, " +
    "never the reverse (grain ordering, real corpus)") {
    import org.apache.spark.sql.functions.col
    val span = Corpus.textDecontamSpan(spark, sfDir)
      .select(col("doc_id"), col("n_contam")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flag = Corpus.textDecontam(spark, sfDir)
      .select(col("doc_id"), col("contaminated")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(span.keySet == flag.keySet, "same corpus split")
    val spanHit = span.filter(_._2 > 0L).keySet
    // a shared 25-token run contains shared 5-grams, so every span hit
    // must also be 5-gram flagged
    spanHit.foreach(id =>
      assert(flag(id), s"doc $id: span-contaminated but not flagged"))
    // and the flag grain is strictly coarser on this corpus: some
    // flagged doc has no 25-token span (or the fixture is degenerate)
    assert(flag.count(_._2) >= spanHit.size)
  }
}
