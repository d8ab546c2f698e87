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
}
