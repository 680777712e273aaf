package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ImporterStandardizer
import graft.sources.OrderedScan

/** J1/J2/F14/F15: fuzzy importer standardization against the real master
  * catalog (/root/reference/data/processed/bd-importadores.csv). */
class ImporterStandardizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val catalog = OrderedScan.csvCatalog(
    spark, "/root/reference/data/processed/bd-importadores.csv")

  test("exact, junk-variant, and garbage names standardize as expected") {
    val df = Seq(
      ("Astara Chile SPA", 1),       // exact → accepted
      ("Astara. Chile - SPA", 2),    // junk chars only → strip → exact
      ("BYD  Chile\tSPA", 3),        // tabs/spaces → exact after strip
      ("zzzz qqqq vvvv", 4)          // garbage → not found, name kept
    ).toDF("IMPORTADOR", "id")
    val r = ImporterStandardizer.standardize(df, catalog,
      threshold = 0.6, variant = ImporterStandardizer.Legacy)
    val out = r.standardized.orderBy("id")
      .select("IMPORTADOR", "RUT", "IMP_COD").collect()

    assert(out(0).getString(0) == "Astara Chile SPA")
    assert(out(0).getString(1) == "96.861.240-9")
    assert(out(0).getString(2) == "ASTA968612409")
    assert(out(1).getString(0) == "Astara Chile SPA")
    assert(out(2).getString(0) == "BYD Chile SPA")
    assert(out(3).getString(0) == "zzzz qqqq vvvv")
    assert(out(3).isNullAt(1) && out(3).isNullAt(2))

    val nf = r.notFound.as[String].collect().toSet
    assert(nf == Set("zzzz qqqq vvvv"))
  }

  test("new-path variant accepts at exactly the threshold (inclusive)") {
    val df = Seq(("Astara Chile SPA", 1)).toDF("IMPORTADOR", "id")
    val r = ImporterStandardizer.standardize(df, catalog,
      threshold = 1.0, variant = ImporterStandardizer.Normalized)
    assert(r.notFound.count() == 0) // score 1.0 >= 1.0 accepted
    val r2 = ImporterStandardizer.standardize(df, catalog,
      threshold = 1.0, variant = ImporterStandardizer.Legacy)
    assert(r2.notFound.count() == 1) // legacy is strict >
  }

  test("blocked fuzzy join agrees with the broadcast cross join on the catalog") {
    import graft.ops.FuzzyJoin
    val probes = Seq("Astara Chile SPA", "BYD Chile SPA", "Automotores Gildemeister SPA")
      .toDF("name")
    val direct = FuzzyJoin.bestMatch(probes, "name", catalog, "NOMBRE_EMP", 0.6)
      .select("name", "NOMBRE_EMP").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val blocked = FuzzyJoin.bestMatchBlocked(probes, "name", catalog, "NOMBRE_EMP", 0.6)
      .select("name", "NOMBRE_EMP").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(direct == blocked)
    assert(direct.size == 3)
  }

  test("bestMatch keeps duplicate probe rows (top-1 per ROW, not per value)") {
    import graft.ops.FuzzyJoin
    val probes = Seq(
      ("Astara Chile SPA", 1), ("Astara Chile SPA", 2), ("BYD Chile SPA", 3)
    ).toDF("name", "id")
    val out = FuzzyJoin.bestMatch(probes, "name", catalog, "NOMBRE_EMP", 0.6)
    assert(out.select("id").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    // both duplicates matched the same catalog row
    assert(out.where($"id".isin(1, 2)).select("NOMBRE_EMP").distinct().count() == 1)
  }

  test("union of per-sheet grids stacks with a _sheet column") {
    import graft.sources.OrderedScan
    val s0 = OrderedScan.fromGrid(spark, Seq(Seq("a", "b")), 2)
    val s1 = OrderedScan.fromGrid(spark, Seq(Seq("c", "d"), Seq("e", "f")), 2)
    val u = OrderedScan.unionSheets(Seq(s0, s1))
    assert(u.count() == 3)
    assert(u.where("_sheet = 1").count() == 2)
    assert(u.columns.contains("_row_idx"))
  }

  test("plan uses broadcast joins, not a shuffled fact join") {
    val df = Seq(("Astara Chile SPA", 1)).toDF("IMPORTADOR", "id")
    val r = ImporterStandardizer.standardize(df, catalog)
    val plan = r.standardized.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
