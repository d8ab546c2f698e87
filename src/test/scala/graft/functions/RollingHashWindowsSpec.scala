package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** The rolling recurrence must equal the direct polynomial evaluation
  * at every offset — the whole point of the kernel is that the O(n)
  * roll computes the same keys the O(n·w) direct form would. */
class RollingHashWindowsSpec extends SparkSpec {

  private val B1 = java.lang.Long.parseUnsignedLong("9E3779B97F4A7C15", 16)
  private val B2 = java.lang.Long.parseUnsignedLong("C2B2AE3D27D4EB4F", 16)

  private def tokHash(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  private def direct(toks: Seq[String], i: Int, w: Int, b: Long): Long =
    toks.slice(i, i + w).foldLeft(0L)((acc, t) => acc * b + tokHash(t))

  private def kernel(toks: Seq[String], w: Int): Seq[(Int, Long, Long)] = {
    val arr = new GenericArrayData(
      toks.map(t => UTF8String.fromString(t)).toArray[Any])
    val out = RollingHashMath.windows(arr, w)
    (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 3)
      (r.getInt(0), r.getLong(1), r.getLong(2))
    }
  }

  test("rolled hashes equal the direct polynomial at every offset") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 30) {
      val n = 1 + rnd.nextInt(40)
      val w = 1 + rnd.nextInt(12)
      // small vocabulary forces repeated tokens (the subtraction path
      // of the roll gets exercised by repeats and by sign wraparound)
      val toks = Seq.fill(n)(s"t${rnd.nextInt(5)}")
      val got = kernel(toks, w)
      if (n < w) assert(got.isEmpty, s"trial $trial")
      else {
        assert(got.length == n - w + 1, s"trial $trial")
        got.foreach { case (pos, h1, h2) =>
          assert(h1 == direct(toks, pos, w, B1), s"trial $trial pos $pos h1")
          assert(h2 == direct(toks, pos, w, B2), s"trial $trial pos $pos h2")
        }
      }
    }
  }

  test("equal windows get equal keys; different windows differ") {
    val toks = "a b c d a b c d x a b c d".split(" ").toSeq
    val ks = kernel(toks, 4).map(t => (t._2, t._3))
    // positions 0 and 9 both hold [a b c d]
    assert(ks(0) == ks(9))
    // sanity: the 128-bit keys of distinct windows are all distinct here
    val distinctWins = toks.sliding(4).toSeq.zipWithIndex
      .groupBy(_._1).values.map(_.head._2).toSet
    val dk = distinctWins.map(ks)
    assert(dk.size == distinctWins.size)
  }
}
