package graft

import org.apache.spark.sql.functions._
import graft.ext.Graph

/** Laws of the graph-signal operators: PageRank's integer mass
  * arithmetic (symmetry, authority ordering, dangling-mass drop,
  * damping endpoints) and label propagation's sweep semantics
  * (distance rounds, majority, deterministic ties, frozen seeds).
  */
class GraphSpec extends SparkSuite {

  import spark.implicits._

  private def pr(edges: Seq[(String, String, Long)], iters: Int = 3,
                 damp: Int = 85) =
    Graph.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w",
        iters, damp)
      .as[(String, Long)].collect().toMap

  test("pageRank: a symmetric cycle keeps every node at exactly the uniform mass") {
    val ranks = pr(Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L)))
    val uniform = Graph.RankScale / 3
    assert(ranks.size == 3 && ranks.values.forall(_ == uniform), ranks)
  }

  test("pageRank: the hub of a star out-ranks its spokes; dangling mass drops") {
    // 4 spokes -> hub; hub has NO out-edges (dangling)
    val ranks = pr((1 to 4).map(i => (s"s$i", "hub", 1L)))
    assert(ranks("hub") > ranks("s1"), ranks)
    assert(ranks("s1") == ranks("s2") && ranks("s2") == ranks("s3"))
    // hub's inflow left the system each round: total < RankScale
    assert(ranks.values.sum < Graph.RankScale, ranks)
  }

  test("pageRank: damping 0 is pure teleport; weights steer the split") {
    val d0 = pr(Seq(("a", "b", 1L), ("b", "a", 9L)), damp = 0)
    assert(d0.values.toSet == Set(Graph.RankScale / 2), d0)
    // a splits 3:1 toward b vs c — b must out-rank c at full damping
    val w = pr(Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L),
      ("c", "a", 1L)), damp = 100)
    assert(w("b") > w("c"), w)
  }

  test("pageRank: null/non-positive edges excluded; plan has no cartesian product") {
    val df = Seq(("a", "b", 1L), ("a", "c", 0L)).toDF("src", "dst", "w")
      .union(Seq(("x", null.asInstanceOf[String], 5L)).toDF("src", "dst", "w"))
    val out = Graph.pageRank(df, "src", "dst", "w", iterations = 2)
    assert(out.as[(String, Long)].collect().toMap.keySet == Set("a", "b"))
    assert(!out.queryExecution.executedPlan.toString
      .contains("CartesianProduct"))
  }

  test("labelPropagation: chain distance = round, horizon bounded by rounds, seeds frozen") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val seeds = Seq((1L, "x")).toDF("node", "lab")
    val got = Graph.labelPropagation(edges, "a", "b", seeds, "node", "lab",
        rounds = 2)
      .collect().map(r => (r.getString(0), (r.getString(1), r.getLong(2))))
      .toMap
    assert(got == Map("1" -> ("x", 0L), "2" -> ("x", 1L),
      "3" -> ("x", 2L)), got) // 4,5 beyond the 2-round horizon: absent
    // a seed adjacent to differently-labeled mass never flips
    val twoSeeds = Seq((1L, "x"), (2L, "y")).toDF("node", "lab")
    val frozen = Graph.labelPropagation(edges, "a", "b", twoSeeds,
        "node", "lab", rounds = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(frozen("1") == "x" && frozen("2") == "y", frozen)
  }

  test("bradleyTerry: symmetric records tie at uniform, dominance orders strengths, zero-win tail disclosed at 0") {
    import graft.ext.Preference
    def bt(c: Seq[(String, String, Long)]) =
      Preference.bradleyTerryScores(c.toDF("w", "l", "n"), "w", "l", "n")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // perfectly balanced head-to-head: both stay at the uniform start
    val even = bt(Seq(("a", "b", 5L), ("b", "a", 5L)))
    assert(even("a")._1 == Preference.Scale &&
      even("b")._1 == Preference.Scale, even)
    // a dominates b dominates c: strengths must order a > b > c, and
    // c (zero wins) is disclosed at exactly 0 with its matches counted
    val dom = bt(Seq(("a", "b", 9L), ("b", "a", 1L), ("b", "c", 6L)))
    assert(dom("a")._1 > dom("b")._1 && dom("b")._1 > dom("c")._1, dom)
    assert(dom("c") == ((0L, 0L, 6L)), dom)
    // self-comparisons and non-positive counts are excluded
    val selfy = bt(Seq(("a", "a", 7L), ("a", "b", 2L), ("b", "a", 0L)))
    assert(selfy("a")._3 == 2L && selfy("b") == ((0L, 0L, 2L)), selfy)
  }

  test("labelPropagation: majority wins, ties take the smallest label") {
    // node 9 has neighbors: two labeled "b", one labeled "a" -> "b";
    // node 10 has one "a" and one "b" neighbor -> tie -> "a"
    val edges = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 10L), (5L, 10L))
      .toDF("a", "b")
    val seeds = Seq((1L, "b"), (2L, "b"), (3L, "a"), (4L, "a"), (5L, "b"))
      .toDF("node", "lab")
    val got = Graph.labelPropagation(edges, "a", "b", seeds, "node", "lab",
        rounds = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got("9") == "b" && got("10") == "a", got)
  }
}
