package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sketch-family certifications beyond the oracle gate: the MERGE laws
  * that make the sketches usable as 100 TB shard summaries, and the
  * one-sided CMS error guarantee.
  */
class SketchesSpec extends SparkSpec {

  test("KMV closure: merge(sketch(A), sketch(B)) == sketch(A union B)") {
    import spark.implicits._
    val ha = (1L to 900L).map(i => ("x", i * 7919L % 100003L)).distinct
    val hb = (500L to 1400L).map(i => ("x", i * 104729L % 100003L)).distinct
    val dfa = ha.toDF("t", "h")
    val dfb = hb.toDF("t", "h")
    val both = dfa.unionByName(dfb).distinct()
    val skA = Sketches.kmvSketch(dfa).select(col("sk")).as[Seq[Long]].head
    val skB = Sketches.kmvSketch(dfb).select(col("sk")).as[Seq[Long]].head
    val skU = Sketches.kmvSketch(both).select(col("sk")).as[Seq[Long]].head
    val merged = (skA ++ skB).distinct.sorted.take(256)
    assert(merged == skU)
  }

  test("h60Scala replicates the h60 column hash byte-for-byte") {
    import spark.implicits._
    val ids = (0L to 500L).toSeq
    val fromCol = ids.toDF("u")
      .select(Sketches.h60(col("u").cast("string")).as("h"))
      .as[Long].collect().toSeq
    assert(fromCol == ids.map(i => Sketches.h60Scala(i.toString)))
  }

  test("CMS additivity: sketch(all) == cellwise sum of split sketches") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id").as("u"), col("event_id"))
    val s1 = Sketches.cmsSketch(ev.filter(col("event_id") % 2 === 0).select("u"))
    val s2 = Sketches.cmsSketch(ev.filter(col("event_id") % 2 === 1).select("u"))
    val full = Sketches.cmsSketch(ev.select("u"))
    val summed = s1.select(col("j"), col("cell"), col("c").as("c1"))
      .join(s2.select(col("j"), col("cell"), col("c").as("c2")), Seq("j", "cell"), "full")
      .select(col("j"), col("cell"),
        (coalesce(col("c1"), lit(0L)) + coalesce(col("c2"), lit(0L))).as("c"))
    assert(summed.exceptAll(full).isEmpty && full.exceptAll(summed).isEmpty)
  }

  test("CMS guarantee: estimate never undercounts (overest >= 0)") {
    val out = Sketches.cmsFreq(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("overest") >= 0L))
  }

  test("KMV estimates: exact below saturation, bounded error above") {
    val out = Sketches.kmvOverlap(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nda, esta) = (r.getAs[Long]("nd_a"), r.getAs[Double]("est_a"))
      if (nda < 256) assert(esta == nda.toDouble)
      else assert(math.abs(esta - nda) / nda < 0.3)
      // union sketch's kth min <= either side's => union estimate dominates
      assert(r.getAs[Double]("est_union") >=
        math.max(r.getAs[Double]("est_a"), r.getAs[Double]("est_b")) - 1e-9)
    }
  }

  test("KMV calibration twin: exact intersections match a driver replay; guard loud") {
    val out = Sketches.kmvCalibration(spark, sfDir).collect()
    assert(out.nonEmpty)
    val du = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_type"), col("user_id")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { r =>
      val want = (du(r.getAs[String]("type_a"))
        intersect du(r.getAs[String]("type_b"))).size.toLong
      assert(r.getAs[Long]("n_inter") == want)
    }
    // past the guard the exact self-join must abort loudly
    val e = intercept[IllegalArgumentException] {
      Sketches.kmvCalibration(spark, sfDir, cap = 1L)
    }
    assert(e.getMessage.contains("trust q_kmv_overlap"))
  }
}
