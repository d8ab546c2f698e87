package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Ad-hoc stage-cost diagnostic for the pagerank round shape (not a
  * registered query; kept for profiling sessions). Times each
  * component of one power-iteration round in isolation. */
object PrDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark: SparkSession = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val bean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def t[A](name: String)(f: => A): A = {
      val w0 = System.nanoTime(); val c0 = bean.getProcessCpuTime
      val r = f
      val w1 = System.nanoTime(); val c1 = bean.getProcessCpuTime
      println(f"[diag] $name%-28s wall=${(w1 - w0) / 1e9}%7.3f cpu=${(c1 - c0) / 1e9}%7.3f")
      r
    }
    val e = t("coEdges build+hot") {
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val ed = li.as("l1").join(li.as("l2"), col("l1.ok") === col("l2.ok") &&
          col("l1.pk") < col("l2.pk"))
        .select(col("l1.pk").as("a"), col("l2.pk").as("b")).distinct()
      val h = Tables.hot(Tables.fanout(ed)); h.count(); h
    }
    val dirE = e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
    val deg = t("degree agg+hot") {
      val d = Tables.hot(dirE.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg")))
      d.count(); d
    }
    val adj = t("adj join+hot") {
      val a = Tables.hot(dirE.join(broadcast(deg).withColumnRenamed("v", "src"), "src")
        .select(col("src"), col("dst"), col("deg")))
      a.count(); a
    }
    val n = broadcast(deg.agg(count(lit(1)).as("nv")))
    var st = Tables.hot(deg.crossJoin(n)
      .select(col("v"), (lit(1.0) / col("nv")).as("pr")))
    for (i <- 1 to 5) {
      st = t(s"round $i (join+agg+hot)") {
        val contrib = adj.join(broadcast(st), col("src") === col("v"))
          .select(col("dst"),
            floor(col("pr") / col("deg") * lit(1e15) + lit(0.5)).cast("long").as("c"))
        val merged = contrib.groupBy(col("dst").as("v"))
          .agg((sum(col("c")).cast("double") / lit(1e15)).as("sc"))
          .crossJoin(n)
          .select(col("v"), (lit(0.15) / col("nv") + lit(0.85) * col("sc")).as("pr"))
        val h = Tables.hot(merged); h.count(); h
      }
    }
    t("final collect") { st.orderBy("v").collect().length }
    spark.stop()
  }
}
