package graft

import org.apache.spark.storage.StorageLevel

/** Unit certification of the FrozenMemo contract (the r13 ADVICE
  * item): concurrent callers of one key produce exactly ONE build —
  * the old get-then-put shape let two concurrent builders race and
  * leaked the loser's pinned checkpoint RDDs for the JVM lifetime —
  * and dead pinned blocks trigger a rebuild while live ones are
  * served. */
class FrozenMemoSpec extends SparkSpec {

  test("concurrent getOrBuild builds exactly once per key") {
    val memo = new FrozenMemo[String, Int]()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val results = (1 to 16).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = memo.getOrBuild("k", spark) {
            Thread.sleep(50) // widen the race window
            (builds.incrementAndGet(), Seq.empty)
          }
        })
      }
      val vals = results.map(_.get()).toSet
      assert(builds.get() == 1,
        s"expected exactly one build under contention, got ${builds.get()}")
      assert(vals == Set(1), s"all callers must see the single artifact: $vals")
    } finally pool.shutdown()
  }

  test("dead pinned blocks rebuild; live ones are served") {
    val memo = new FrozenMemo[String, Int]()
    val sc = spark.sparkContext
    val rdd1 = sc.parallelize(1 to 4).persist(StorageLevel.MEMORY_ONLY)
    rdd1.count()
    val rdd2 = sc.parallelize(1 to 4).persist(StorageLevel.MEMORY_ONLY)
    rdd2.count()
    var builds = 0
    var backing = rdd1
    def get(): Int = memo.getOrBuild("k", spark) {
      builds += 1
      (builds, Seq(backing))
    }
    assert(get() == 1)
    assert(get() == 1, "a live artifact must be served, not rebuilt")
    rdd1.unpersist(blocking = true)
    backing = rdd2
    assert(get() == 2, "dead pinned blocks must trigger a rebuild")
    assert(get() == 2, "the rebuilt artifact is live and served")
    rdd2.unpersist(blocking = true)
  }
}
