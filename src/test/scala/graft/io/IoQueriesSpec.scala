package graft.io

import graft.SparkSpec
import graft.ops.IoQueries

class IoQueriesSpec extends SparkSpec {

  test("q_dpp_join: the partitioned fact scan carries a dynamic pruning filter") {
    val df = IoQueries.qDppJoin(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      "fact scan must be runtime-pruned from the dim build side")
    // and the pruning is semantics-invisible
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSet == Set("click", "purchase"))
  }

  test("q_partition_sink: the read-back scan prunes partitions statically") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = IoQueries.qPartitionSink(spark, sfDir)
    assert(df.collect().nonEmpty) // also materializes the partitioned write
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "day % 7 = 3 must reach the scan as a partition filter")
    val meta = scan.metadata.getOrElse("PartitionFilters", "")
    assert(meta.nonEmpty)
    // listing-level pruning: strictly fewer files selected than exist
    val selected = scan.selectedPartitions.totalNumberOfFiles
    val total = scan.relation.location.inputFiles.length.toLong
    assert(selected < total,
      s"pruned listing expected: selected=$selected of $total files")
  }

  test("q_schema_union: the missing column fills with NULL, not a default") {
    val rows = IoQueries.qSchemaUnion(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.contains("<missing>"), "old-vintage rows must surface as NULL")
    assert(rows.keySet.size >= 2, "both vintages must contribute")
  }
}
