package graft

import org.apache.spark.sql.SparkSession

/** Opinionated SparkSession factory carrying the engine's tuned
  * defaults — what Verify/Bench/specs use, packaged for library users.
  */
object GraftSession {

  /** @param cores      local parallelism (also shuffle partitions —
    *                    on a real cluster set shuffle partitions to
    *                    2–3× total executor cores instead)
    */
  def local(cores: Int, extraConf: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events parquet carries TIMESTAMP(NANOS)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // wide signature self-joins blow up constraint propagation
      // (re-run per AQE re-optimization); graft plans don't rely on
      // inferred constraints
      .config("spark.sql.constraintPropagation.enabled", "false")
      // native graft expressions available from SQL
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
    extraConf.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
    s
  }
}
