package graft.ops

import graft.{SparkSpec, Tables}
import graft.functions.Vec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private def e = {
    graft.GraftFunctions.register(spark)
    Tables.fanout(Tables.load(spark, sfDir, "embeddings"))
      .select(col("vec_id"), Vec.asDouble(col("embedding")).as("v"))
  }

  test("codes are in range and errors non-negative") {
    val rows = VectorOps.embedPq(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (1 to 4).foreach { i =>
        val c = r.getLong(i)
        assert(c >= 0 && c < VectorOps.PqK, s"code out of range: $c")
      }
      assert(r.getDouble(5) >= 0.0)
    }
  }

  test("one Lloyd refinement does not worsen mean reconstruction error") {
    def meanErr(iters: Int): Double =
      VectorOps.pqEncode(e, VectorOps.pqCodebook(e, iters))
        .agg(avg("recon_err")).collect()(0).getDouble(0)
    val seedErr = meanErr(0)
    val refined = meanErr(1)
    assert(refined <= seedErr + 1e-9,
      s"Lloyd step worsened mean PQ error: seed=$seedErr refined=$refined")
  }
}
