package graft.functions

class HilbertSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("xy2d is a bijection over the 8x8 grid") {
    val ds = for (x <- 0 until 8; y <- 0 until 8)
      yield HilbertMath.xy2d(3, x, y)
    assert(ds.toSet == (0 until 64).toSet)
  }

  test("consecutive curve positions are grid neighbors (locality)") {
    val pos = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield HilbertMath.xy2d(4, x, y) -> (x, y)).toMap
    (0L until 255L).foreach { d =>
      val (x1, y1) = pos(d); val (x2, y2) = pos(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1)->($x2,$y2)")
    }
  }
}
