package graft

import graft.plans.ConnectedComponents
import org.apache.spark.sql.functions._

/** Correctness of the DataFrame large-star/small-star CC against a
  * union-find ground truth on randomized graphs (fixed seeds), plus shape
  * edge cases. GraphX would also serve as an oracle, but union-find on the
  * driver is exact and dependency-free at test sizes.
  */
class ConnectedComponentsSpec extends SparkSuite {

  // nodes are exactly the edge endpoints (no isolated-node domain): the
  // ground truth contains a row per endpoint, same as the operator's input
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(v => v -> find(v)).toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val want = unionFind(edges)
    // threshold 0 forces the distributed star-contraction rounds; the
    // default takes the driver union-find at test sizes — both must agree
    // with the ground truth
    for (threshold <- Seq("0", (1L << 20).toString)) {
      spark.conf.set("graft.cc.localFinishEdges", threshold)
      try {
        val got = ConnectedComponents.components(edges.toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"CC mismatch (localFinishEdges=$threshold): got $got want $want")
      } finally spark.conf.unset("graft.cc.localFinishEdges")
    }
  }

  test("mid-loop local finish: rounds shrink the edge set below the budget") {
    import spark.implicits._
    val edges = (1L to 200L).sliding(2).map(s => (s.head, s.last)).toSeq
    val want = unionFind(edges)
    spark.conf.set("graft.cc.localFinishEdges", "100") // 199 initial edges: rounds first
    try {
      val got = ConnectedComponents.components(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want)
    } finally spark.conf.unset("graft.cc.localFinishEdges")
  }

  test("int-typed node ids keep their type through the local finish") {
    import spark.implicits._
    val got = ConnectedComponents.components(Seq((7, 3), (3, 9)).toDF("a", "b"))
    assert(got.schema("node").dataType == org.apache.spark.sql.types.IntegerType)
    assert(got.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap ==
      Map(3 -> 3, 7 -> 3, 9 -> 3))
  }

  test("chains, stars, cycles, isolated pairs") {
    // long chain (worst case for label propagation, fine for star algorithm)
    check((1L to 200L).sliding(2).map(s => (s.head, s.last)).toSeq)
    // star centered on a high id
    check((1L to 50L).map(i => (1000L, i)))
    // cycle
    check(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    // two components + duplicate and reversed edges + self loop
    check(Seq((5L, 6L), (6L, 5L), (5L, 5L), (10L, 11L), (11L, 12L)))
  }

  test("randomized graphs match union-find (fixed seeds)") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val n = 300
      val edges = Seq.fill(400)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      check(edges)
    }
  }

  test("5k-node chain and dense star converge within the round budget") {
    // chain: worst case for label propagation (diameter = n); the star
    // algorithm must converge in O(log^2 n) rounds, well under MaxRounds
    check((1L to 5000L).sliding(2).map(s => (s.head, s.last)).toSeq)
    // dense star with a skewed hub (the boilerplate near-dup cluster shape)
    check((1L to 2000L).map(i => (9999999L, i)))
  }

  test("self-loop-only nodes get their singleton row (contract: every input node)") {
    import spark.implicits._
    // node 9 appears ONLY as a self-loop; node 1-2 is a real component —
    // both threshold paths must emit (9, 9), not drop the node
    for (threshold <- Seq("0", (1L << 20).toString)) {
      spark.conf.set("graft.cc.localFinishEdges", threshold)
      try {
        val got = ConnectedComponents.components(
          Seq((9L, 9L), (1L, 2L)).toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == Map(9L -> 9L, 1L -> 1L, 2L -> 1L),
          s"self-loop singleton missing (localFinishEdges=$threshold): $got")
      } finally spark.conf.unset("graft.cc.localFinishEdges")
    }
  }

  test("empty edge set yields empty assignment") {
    import spark.implicits._
    val got = ConnectedComponents.components(Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(got.count() == 0)
  }

  test("component label is always the component minimum") {
    import spark.implicits._
    val edges = Seq((7L, 3L), (3L, 9L), (20L, 21L))
    val got = ConnectedComponents.components(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(7L) == 3L && got(9L) == 3L && got(3L) == 3L)
    assert(got(20L) == 20L && got(21L) == 20L)
  }
}
