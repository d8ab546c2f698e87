package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The BPE merge fold must implement LEFTMOST-GREEDY non-overlapping
  * pair replacement — the property a plain string replace gets wrong
  * on runs sharing a boundary separator.
  */
class BpeSpec extends SparkSpec {

  private def fold(sq: String, x: String, y: String): String = {
    import spark.implicits._
    Seq(sq).toDF("sq")
      .select(expr(
        s"""aggregate(split(sq, ' '), CAST('' AS STRING), (acc, s) ->
          CASE WHEN acc = '' THEN s
               WHEN element_at(split(acc, ' '), -1) = '$x' AND s = '$y'
                 THEN concat(left(acc, length(acc) - length('$x')), '$x', '$y')
               ELSE concat(acc, ' ', s) END)""").as("m"))
      .collect()(0).getString(0)
  }

  test("merge fold is leftmost-greedy on runs") {
    assert(fold("a a a", "a", "a") === "aa a")
    assert(fold("a a a a", "a", "a") === "aa aa")
    assert(fold("a a a a a", "a", "a") === "aa aa a")
  }

  test("merge fold does not cross symbol boundaries") {
    // symbols [bx, y]: pair (x, y) must NOT match inside "bx"
    assert(fold("bx y", "x", "y") === "bx y")
    // merged symbols are atomic: (a, a) does not re-match against "aa"
    assert(fold("aa a", "a", "a") === "aa a")
  }

  test("merge fold handles mixed neighborhoods") {
    assert(fold("t h e", "t", "h") === "th e")
    assert(fold("t h t h", "t", "h") === "th th")
    assert(fold("h t h", "t", "h") === "h th")
  }

  test("train yields monotone-usable merge table; encode conserves words") {
    val m = Bpe.bpeTrain(spark, sfDir).collect()
    assert(m.length === Bpe.Rounds)
    assert(m.map(_.getInt(0)).toSeq === (1 to Bpe.Rounds))
    assert(m.forall(_.getLong(3) > 0))
    val enc = Bpe.bpeEncode(spark, sfDir).collect()
    // BPE can only SHORTEN the per-word symbol count from chars and
    // never below 1 token per word
    enc.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"bpe tokens below one per word: $r")
      assert(r.getDouble(3) >= 1.0)
    }
  }

  test("byte-level base alphabet is the UTF-8 byte sequence") {
    import spark.implicits._
    // 'héllo' = 68 C3 A9 6C 6C 6F — the accented char contributes TWO
    // base symbols (the byte-level property: no unknown alphabet, and
    // merges may later cross character-fragment boundaries)
    val sq = Seq("héllo").toDF("w")
      .withColumn("hx", hex(encode(col("w"), "UTF-8")))
      .select(expr("""array_join(transform(sequence(1, length(hx) DIV 2),
        i -> conv(substring(hx, i * 2 - 1, 2), 16, 10)), ' ')"""))
      .head.getString(0)
    assert(sq == "104 195 169 108 108 111")
  }

  test("byte-level encode: merges only shrink, never below one token " +
    "per word, tokens-per-byte <= 1") {
    val rows = Bpe.bpeBytes(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, b, t) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(t <= b, s"merges can only shrink: $r")
      assert(t >= w, s"a word is at least one token: $r")
      assert(r.getDouble(5) <= 1.0)
    }
  }

  test("text_fertility: parity floors at 1.0 on the best language and " +
    "the table conserves the corpus against text_bpe_bytes") {
    val fert = Bpe.textFertility(spark, sfDir).collect()
    val bytes = Bpe.bpeBytes(spark, sfDir).collect()
    assert(fert.nonEmpty)
    fert.foreach { r =>
      val (w, b, t) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(t <= b && t >= w, s"fertility bounds violated: $r")
      // bpe_per_byte is exactly the row's own ratio at 6 dp
      val want = BigDecimal(java.math.BigDecimal.valueOf(t.toDouble / b))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) == want, s"ratio mismatch: $r")
      assert(r.getDouble(5) >= 1.0, s"parity below 1: $r")
    }
    assert(fert.exists(_.getDouble(5) == 1.0), "no best language at parity 1")
    // same corpus, different grouping: word/byte/token totals conserve
    def tot(rs: Array[org.apache.spark.sql.Row], i: Int) =
      rs.map(_.getLong(i)).sum
    assert(tot(fert, 1) == tot(bytes, 1) && tot(fert, 2) == tot(bytes, 2)
      && tot(fert, 3) == tot(bytes, 3), "lang and source totals diverge")
  }
}
