package graft.ops

import graft.SparkSpec
import graft.functions.Tar
import org.apache.spark.sql.functions._

class WebDataSpec extends SparkSpec {

  test("canonical URL normalizes every rule and keeps real params") {
    import spark.implicits._
    val cases = Seq(
      ("HTTP://Example.COM:80/a/?utm_source=x&b=1#top",
        "http://example.com/a?b=1"),
      ("https://Example.com:443/p/q/", "https://example.com/p/q"),
      ("https://example.com", "https://example.com/"),
      ("http://h/x?z=2&a=1&gclid=abc&fbclid=d", "http://h/x?a=1&z=2"),
      ("http://h:8080/x", "http://h:8080/x")) // non-default port kept
    val got = cases.map(_._1).toDF("url")
      .select(WebData.canonicalUrl(col("url"))).collect().map(_.getString(0))
    assert(got.toSeq == cases.map(_._2))
  }

  test("tar archives round-trip and match the system tar binary") {
    val members = Seq(
      "1.txt" -> "hello world".getBytes("UTF-8"),
      "2.txt" -> Array.empty[Byte], // zero-length member
      "1234567.txt" -> ("x" * 1000).getBytes("UTF-8")) // multi-block
    val tar = Tar.archive(members.iterator)
    // self round-trip: names + exact content
    val back = Tar.extract(tar)
    assert(back.map(_._1) == members.map(_._1))
    assert(back.zip(members).forall { case ((_, a), (_, b)) =>
      java.util.Arrays.equals(a, b)
    })
    // archive size: 3 headers + padded contents + 2 end blocks
    assert(tar.length == 512 * (3 + 0 + 1 + 2 + 2))
    // cross-validate against the system tar: names and sizes agree
    val f = java.nio.file.Files.createTempFile("graft-wds", ".tar")
    java.nio.file.Files.write(f, tar)
    val out = new StringBuilder
    val p = new ProcessBuilder("tar", "-tvf", f.toString)
      .redirectErrorStream(true).start()
    scala.io.Source.fromInputStream(p.getInputStream).getLines()
      .foreach(l => out.append(l).append('\n'))
    assert(p.waitFor() == 0, s"system tar rejected the archive:\n$out")
    val listed = out.toString.trim.split("\n").map { l =>
      val parts = l.trim.split("\\s+")
      (parts.last, parts(2).toLong) // name, size
    }.toSeq
    assert(listed == members.map { case (n, c) => (n, c.length.toLong) },
      s"system tar sees:\n$out")
    java.nio.file.Files.delete(f)
  }

  test("corrupted tar headers fail loudly") {
    val tar = Tar.archive(Iterator("1.txt" -> "abc".getBytes("UTF-8")))
    val broken = tar.clone()
    broken(124) = '7' // corrupt the size field -> checksum mismatch
    val e = intercept[IllegalArgumentException](Tar.extract(broken))
    assert(e.getMessage.contains("checksum mismatch"))
    val truncated = tar.take(tar.length - 512).toArray
    intercept[IllegalArgumentException](Tar.extract(truncated))
  }
}
