package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Queries are materialized through the noop datasource — full compute,
  * no write cost, and no count()-style short-circuiting. One cheap
  * warmup query initializes the JVM/codegen machinery so the first
  * measured query isn't charged Spark's startup.
  *
  * Measurement design (this VM's host steals CPU erratically — wall
  * times swing up to 100× between identical runs while aggregate CPU
  * supply stays roughly conserved):
  *   - each query runs SPARK_GRAFT_ITERS times (default 3), iterations
  *     interleaved across the whole suite so one steal burst cannot
  *     poison all samples of a single query;
  *   - the JSON reports the per-query MIN wall ("queries", the driver's
  *     headline numbers) and MIN process-CPU seconds ("queries_cpu"),
  *     plus every raw sample ("samples") for adjudication. CPU-seconds
  *     barely move under steal, so queries_cpu is the number that
  *     certifies a plan; wall is the number a quiet machine would show.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOG", "ERROR"))

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def r3(d: Double): Double = math.rint(d * 1000) / 1000
    /** One timed run → (wall, cpu) seconds, (-1, -1) on failure. */
    def exec(name: String, it: Int): (Double, Double) = {
      val t0 = System.nanoTime()
      val c0 = osBean.getProcessCpuTime
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return (-1.0, -1.0)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val dc = (osBean.getProcessCpuTime - c0) / 1e9
      System.err.println(f"[bench] it$it $name%-24s $dt%8.2f s  cpu $dc%8.2f s")
      spark.catalog.clearCache() // no cross-query cache interference
      (r3(dt), r3(dc))
    }

    exec("q6_filter_agg", 0) // warmup (discarded)
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    // interleave: full suite per iteration, so a steal burst hits one
    // sample of many queries rather than all samples of one query
    val samples: Map[String, Seq[(Double, Double)]] = {
      val runs = (1 to iters).map(it => names.map(n => n -> exec(n, it)))
      names.map(n => n -> runs.map(_.toMap.apply(n))).toMap
    }
    def minOk(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    }
    val wallMin = names.map(n => n -> minOk(samples(n).map(_._1)))
    val cpuMin = names.map(n => n -> minOk(samples(n).map(_._2)))
    def obj(kvs: Seq[(String, String)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = obj(wallMin.map { case (k, v) => k -> v.toString })
    val qsCpu = obj(cpuMin.map { case (k, v) => k -> v.toString })
    val raw = obj(names.map { n =>
      n -> obj(Seq(
        "wall" -> samples(n).map(_._1).mkString("[", ",", "]"),
        "cpu" -> samples(n).map(_._2).mkString("[", ",", "]")))
    })
    val total = r3(wallMin.map(_._2).filter(_ >= 0).sum)
    val totalCpu = r3(cpuMin.map(_._2).filter(_ >= 0).sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","total_cpu":$totalCpu,"iters":$iters,"queries":$qs,"queries_cpu":$qsCpu,"samples":$raw,"sf":"$sfDir"}""")
    spark.stop()
  }
}
