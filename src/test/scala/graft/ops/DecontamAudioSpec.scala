package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant specs for the round-5 wave: decontamination, repetition
  * signals, grouping sets, and the WAV audio modality (exact values
  * are pinned by the DuckDB oracle gate; these pin the contracts). */
class DecontamAudioSpec extends SparkSpec {

  test("text_decontam: benchmark docs excluded; flags mean real 5-gram overlap") {
    val out = Corpus.textDecontam(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(0) % 31 != 0), "benchmark slice never flagged")
    val flagged = out.filter(_.getBoolean(2))
    assert(flagged.forall(_.getLong(1) > 0) &&
      out.filterNot(_.getBoolean(2)).forall(_.getLong(1) == 0L),
      "contaminated <=> n_overlap > 0")
    // re-verify one flagged doc by hand: it must share a 5-gram with
    // some benchmark document
    flagged.headOption.foreach { r =>
      val docId = r.getLong(0)
      def grams(id: Long => Boolean) = graft.Tables
        .load(spark, sfDir, "documents")
        .filter(udf(id).apply(col("doc_id")))
        .select(explode(graft.ops.Text.grams(5)).as("g"))
        .collect().map(_.getString(0)).toSet
      val docG = grams(_ == docId)
      val benchG = grams(_ % 31 == 0)
      assert(docG.intersect(benchG).size.toLong == r.getLong(1),
        s"doc $docId overlap count mismatch")
    }
  }

  test("text_repetition: signals bounded and consistent") {
    val rows = Corpus.textRepetition(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dr, dup, top) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(dr > 0 && dr <= 1, s"distinct_ratio $dr")
      assert(dup >= 0 && dup <= 1, s"dup_gram_frac $dup")
      assert(top > 0 && top <= 1, s"top_gram_share $top")
      // every instance of the most frequent bigram is a repeat when it
      // occurs >= 2 times, so dup covers at least the top share then
      if (dup > 0) assert(dup + 1e-9 >= top, s"dup $dup < top $top")
    }
  }

  test("text_repetition: run-length fold equals naive quadratic counting") {
    // the shipped operator folds run lengths over a sorted bigram
    // array (O(n log n) per doc); pin it against the direct O(n²)
    // per-instance count, affordable at sf0.001
    val g = Text.grams(2)
    val counts = transform(g, x => size(filter(g, y => y === x)))
    val naive = graft.Tables.load(spark, sfDir, "documents").select(
      col("doc_id"),
      when(size(g) > 0,
        round(size(filter(counts, c => c >= 2)).cast("double") / size(g), 6))
        .otherwise(0.0).as("dup_gram_frac"),
      when(size(g) > 0,
        round(array_max(counts).cast("double") / size(g), 6))
        .otherwise(0.0).as("top_gram_share"))
    val fast = Corpus.textRepetition(spark, sfDir)
      .select("doc_id", "dup_gram_frac", "top_gram_share")
    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty,
      "fold and naive repetition signals diverge")
  }

  test("q_grouping_sets: exactly the three requested sets, no grand total") {
    val rows = Relational7.qGroupingSets(spark, sfDir).collect()
    val markers = rows.map(r => (r.getInt(2), r.getInt(3))).toSet
    assert(markers == Set((0, 0), (0, 1), (1, 0)),
      s"marker combos $markers (grand total (1,1) must be absent)")
    // each subtotal equals the sum of its detail rows
    val detailN = rows.filter(r => r.getInt(2) == 0 && r.getInt(3) == 0)
      .map(_.getLong(4)).sum
    val nSubtotal = rows.filter(r => r.getInt(2) == 0 && r.getInt(3) == 1)
      .map(_.getLong(4)).sum
    assert(detailN == nSubtotal, "per-nation subtotals conserve row count")
  }

  test("WAV codec: bit-exact round trip and loud failure on corruption") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 256, -129)
    val wav = Multimodal.Wav.encode(samples)
    assert(wav.length == 44 + samples.length * 2)
    val (sr, back) = Multimodal.Wav.decode(wav)
    assert(sr == Multimodal.Wav.SampleRate)
    assert(back.sameElements(samples))
    val corrupt = wav.clone(); corrupt(8) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.Wav.decode(corrupt))
  }

  test("GVID video container: bit-exact round trip, loud failure on corruption") {
    val frames = Seq(Array[Byte](1, 2, 3), Array.emptyByteArray,
      Array[Byte](9, -1))
    val enc = Multimodal.Gvid.encode(frames)
    val back = Multimodal.Gvid.decode(enc)
    assert(back.length == 3)
    assert(back(0).sameElements(frames(0)) && back(1).isEmpty &&
      back(2).sameElements(frames(2)))
    val badMagic = enc.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.Gvid.decode(badMagic))
    intercept[IllegalArgumentException](
      Multimodal.Gvid.decode(enc.take(enc.length - 1))) // truncated
    intercept[IllegalArgumentException](
      Multimodal.Gvid.decode(enc :+ 0.toByte)) // trailing bytes
  }

  test("mm_video: frame sampling shape and pixel accounting") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Multimodal.videoPipeline(spark, sfDir).collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      assert(r.getInt(1) == Multimodal.VideoFrames)
      assert(r.getInt(2) == 2, "stride 2 of 4 frames samples exactly 2")
      assert(r.getLong(3) == 2 * docs(r.getLong(0)),
        "sampled pixels = 2 frames x n_chars")
      val (ms, m0) = (r.getDouble(4), r.getDouble(5))
      assert(m0 >= 0 && m0 <= 255 && ms >= 0 && ms <= 255)
    }
  }

  test("mm_audio: decoded stats consistent with text-derived waveform") {
    val out = Multimodal.audioPipeline(spark, sfDir).limit(50).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, peak, rms, nf, frms) =
        (r.getInt(2), r.getInt(3), r.getDouble(4), r.getInt(5), r.getDouble(6))
      assert(peak >= 0 && peak <= 32768)
      assert(rms >= 0 && rms <= peak + 1e-6, s"rms $rms > peak $peak")
      assert(frms >= 0 && frms <= peak + 1e-6)
      assert(nf == (n + 3) / 4, "4:1 frame decimation count")
    }
  }
}
