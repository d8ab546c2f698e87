package graft.ops

import graft.SparkSpec

class CommunitySpec extends SparkSpec {

  test("graph_communities: 4-round synchronous LPA matches an " +
    "independent driver-side replay of the rule") {
    // independent reimplementation: plain Scala maps over the
    // collected edge list, most-frequent-neighbor-label with
    // smallest-label ties, 4 synchronous rounds — no shared code with
    // the distributed operator beyond the edge derivation
    val edges = Graph.coEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSeq }
    var lab: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to 4) {
      lab = adj.map { case (v, nbrs) =>
        val counts = nbrs.groupBy(lab).map { case (l, g) => (l, g.size) }
        // most frequent, ties to the SMALLEST label
        v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val expected = lab.values.groupBy(identity)
      .map { case (l, g) => (l, g.size.toLong) }
    val got = Graph.labelPropagation(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === expected)
    // the fixture must exercise real propagation: at least one vertex
    // ends with a label other than its own id, and communities merge
    assert(got.values.sum === adj.size.toLong, "every vertex labeled once")
    assert(got.size < adj.size, "labels must have propagated")
  }
}
