package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graph rung's synthetic input is a MEASUREMENT instrument — pin
  * the properties the SCALING.md claims rest on: seed determinism (the
  * ×k graph is the same graph every run), the planted Zipf hub (top
  * node holds ≈ E/ln(n) of endpoints), and well-formedness. */
class PlantedGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("plantedGraph: deterministic, well-formed, hub holds ~E/ln(n)") {
    val n = 5000L
    val g1 = graft.tools.ScaleData.plantedGraph(spark, n, 8, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val g2 = graft.tools.ScaleData.plantedGraph(spark, n, 8, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(g1.sorted.sameElements(g2.sorted)) // hash, not RNG: replayable
    // well-formed: targets in [1, n], no self-loops, ~n·avgDeg edges
    // (only self-loop collisions drop)
    assert(g1.forall { case (s, d) => s >= 1 && s <= n && d >= 1 && d <= n && s != d })
    assert(g1.length > n * 8 * 95 / 100)
    // the planted hub: node 1 is the global max-degree vertex and holds
    // at least half its theoretical E/ln(n) share (P(t=1) = ln2/ln n)
    val deg = g1.flatMap { case (s, d) => Seq(s, d) }
      .groupBy(identity).view.mapValues(_.size).toMap
    val hub = deg.maxBy(_._2)
    assert(hub._1 == 1L, s"expected node 1 as hub, got $hub")
    val expected = g1.length / math.log(n.toDouble)
    assert(hub._2 > expected / 2, s"hub degree ${hub._2} vs expected ~$expected")
    // a different seed is a different graph (the generator is seeded,
    // not degenerate)
    val g3 = graft.tools.ScaleData.plantedGraph(spark, n, 8, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!g1.sorted.sameElements(g3.sorted))
  }
}
