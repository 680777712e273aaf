package graft.pipeline

import java.nio.file.Paths

import graft.engine.GraftSession
import graft.ops.CompatMode
import graft.schema.{HeaderRules, MappingStore}
import graft.sources.OrderedScan

/** Runnable EP2+EP3 (the reference's `python src/transform_pipeline.py`
  * and `python src/load_to_gcp.py` in one): raw grid CSV in, published
  * `datos3cv_<minYear>-<maxYear>.csv` out, with the memoized header
  * mapping store round-tripped and a not-found importer report — the
  * fail-fast replacement for the reference's interactive fallback (F25).
  *
  * Usage: runMain graft.pipeline.RunHomologation
  *   <rawGridCsv> <catalogCsv> <outDir> [mappingJson] [reference|intended]
  */
object RunHomologation {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: RunHomologation <rawGridCsv> <catalogCsv> <outDir> [mappingJson] [reference|intended]")
    val Array(gridCsv, catalogCsv, outDir) = args.take(3)
    val mappingJson = args.lift(3)
    val mode = args.lift(4) match {
      case Some("intended") => CompatMode.Intended
      case _                => CompatMode.Reference
    }
    // reuse an already-running session (tests, notebooks) and only own
    // the shutdown when we created it
    val preExisting = org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "homologation")

    val rules = new HeaderRules(mode = mode)
    mappingJson.map(Paths.get(_)).filter(java.nio.file.Files.exists(_))
      .foreach(MappingStore.load(_, rules))

    val grid = OrderedScan.csvGrid(spark, gridCsv)
    val catalog = OrderedScan.csvCatalog(spark, catalogCsv)
    val result = Homologation.pipeline(grid, rules, catalog, mode)

    val published = Homologation.publishProjection(result.standardized)
    val (y0, y1) = Homologation.yearRange(result.standardized)
    val outPath = s"$outDir/datos3cv_${y0}-${y1}.csv"
    OrderedScan.writeSingleCsv(published, outPath)

    // batched store persistence (one write per run, not per header)
    mappingJson.foreach(p => MappingStore.save(rules, Paths.get(p)))

    val notFound = result.notFound.collect().map(_.getString(0))
    if (notFound.nonEmpty) {
      System.err.println(s"[homologation] ${notFound.length} importer(s) not matched:")
      notFound.foreach(n => System.err.println(s"  - $n"))
    }
    println(s"""{"published":"$outPath","rows":${published.count()},"years":[$y0,$y1],"importers_not_found":${notFound.length}}""")
    result.release() // free the pipeline's staging cache (terminal actions done)
    if (!preExisting) spark.stop()
  }
}
