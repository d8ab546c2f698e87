package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {

  private def scrubOne(text: String): (Long, Long, Long, String) = {
    import spark.implicits._
    val r = Privacy.scrub(Seq(text).toDF("text"), "text")
      .select("n_email", "n_phone", "n_ip", "clean_text")
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("each class redacts independently, multiple hits per doc") {
    val (e, p, i, clean) = scrubOne(
      "mail a.b+c@ex.co and d@sub.ex.org, call 010-1234-5678 " +
        "or 02-123-4567, host 10.0.0.1 and 255.255.255.255 end")
    assert(e == 2 && p == 1 && i == 2)
    // 02-123-4567 is NOT a match (area code must be 3 digits)
    assert(clean ==
      "mail <EMAIL> and <EMAIL>, call <PHONE> " +
        "or 02-123-4567, host <IP> and <IP> end")
  }

  test("classes cannot overlap, and redaction is leftmost-greedy") {
    // dotted digits never enter the phone class, dashed never the IP
    // class; 1.2.3.4.5 redacts its leftmost valid IP, leaving ".5"
    val (e, p, i, clean) = scrubOne("a 1.2.3.4.5 b 123-4567-8901")
    assert(e == 0 && p == 1 && i == 1)
    assert(clean == "a <IP>.5 b <PHONE>")
  }

  test("clean text equals input when nothing matches") {
    val (e, p, i, clean) = scrubOne("no pii here 123 456 word@ place")
    assert(e == 0 && p == 0 && i == 0)
    assert(clean == "no pii here 123 456 word@ place")
  }

  test("word boundaries keep long digit runs out of the phone class") {
    val (_, p, _, clean) = scrubOne("id 9010-1234-56789 ok 010-1234-5678")
    assert(p == 1)
    assert(clean == "id 9010-1234-56789 ok <PHONE>")
  }

  test("q_dp_release: thresholds encode the exact discrete Laplace; " +
    "the release replays from raw counts; noise bounded") {
    import org.apache.spark.sql.functions._
    val thr = Privacy.dpThresholds
    val B = Privacy.DpB
    assert(thr.length == 2 * B)
    assert(thr.sameElements(thr.sorted), "inverse CDF must ascend")
    // symmetry of the two-sided geometric: P(z) = P(−z) — threshold
    // gaps mirror around the center (1-ulp floor slack)
    val scale = math.pow(2, 60)
    for (k <- 1 until B) {
      val pNeg = (thr(B - k) - thr(B - k - 1)).toDouble
      val pPos = (thr(B + k) - thr(B + k - 1)).toDouble
      assert(math.abs(pNeg - pPos) <= 2, s"P(-$k) != P($k)")
    }
    // mass at zero is exactly (1−α)/(1+α) = 1/7
    assert(math.abs((thr(B) - thr(B - 1)) / scale - 1.0 / 7) < 1e-12)

    // independent replay: same md5 seeds, same thresholds, driver-side
    def u60(tag: String, src: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s"dp:$tag:$src".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def z(tag: String, src: String): Long =
      -B + thr.count(_ <= u60(tag, src))
    val raw = graft.Tables.load(spark, sfDir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("nd"),
        sum(least(size(split(col("text"), " ")), lit(1000))).as("tc"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    val out = Privacy.dpRelease(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == raw.keySet)
    var anyNoise = false
    out.foreach { case (src, (nd, nt)) =>
      val (rnd, rtc) = raw(src)
      assert(nd == rnd + z("docs", src), s"$src: docs release mismatch")
      assert(nt == ((rtc + 500) / 1000 + z("toks", src)) * 1000,
        s"$src: token release mismatch")
      assert(math.abs(nd - rnd) <= B, s"$src: docs noise out of range")
      if (nd != rnd) anyNoise = true
    }
    assert(anyNoise, "fixture must exercise nonzero noise")
  }
}
