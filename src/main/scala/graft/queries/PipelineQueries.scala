package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.ImporterStandardizer
import graft.pipeline.Homologation
import graft.schema.HeaderRules
import graft.sources.OrderedScan

/** Queries exercising the homologation pipeline and (see DedupQueries /
  * AnnQueries / TextQueries) the LLM-training-data operators. Keys join
  * [[OracleQueries]] in SparkEntry; entries without oracleSql get the
  * driver's rows-only check. */
object PipelineQueries {

  private val N = null.asInstanceOf[String]

  /** Reference-shaped raw homologation grid (multi-row header + string
    * cells + '-' sentinels); the pipeline's demo input, deterministic. */
  def demoGrid(spark: SparkSession): DataFrame = OrderedScan.fromGrid(spark, Seq(
    Seq("Marca", "Modelo", "Importador", "Propulsión", "Combustible",
      "Fecha de Homologación", "P.B.V.              (kg)", "Rendimiento", N,
      "Emisiones de CO2 (g/km)", "CO \n(g/km) Norma Europea", N),
    Seq(N, N, N, N, N, N, N,
      "Mixto Rendimiento de Combustible (km/l)",
      "Rendimiento Eléctrico (km/kwh) Vehículo Eléctrico Puro", N, N, N),
    Seq(N, N, N, N, N, N, N, N, N, N, N, "x"),
    Seq("TOYOTA", "YARIS", "Astara. Chile - SPA", "Combustión", "GASOLINA",
      "2013-01-04", "1500", "15.5", "-", "120", "0.5", N),
    Seq("BYD", "HAN", "Automotores  Gildemeister spa.", "Vehículo Eléctrico", "",
      "-", "-", "-", "6.1", "-", "-", N),
    Seq("KIA", "EV6", "Desconocido Ltda", "Vehículo Eléctrico", "",
      "2014-06-10", "2000", "-", "5.0", "-", "-", N)), 12)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // EP2/EP3 end-to-end: header identify + rules standardizer + typed
    // stages + fuzzy importer join + publish projection. Rows-only check
    // (the multi-stage pipeline is not expressible as one DuckDB query);
    // correctness is pinned by HomologationSpec golden assertions.
    "p01_hom_pipeline" -> ((s, _) => {
      val catalog = OrderedScan.csvCatalog(
        s, "/root/reference/data/processed/bd-importadores.csv")
      val r: ImporterStandardizer.Result =
        Homologation.pipeline(demoGrid(s), new HeaderRules(), catalog)
      Homologation.publishProjection(r.standardized)
        .orderBy("MARCA")
    })
  )

  val oracleSql: Map[String, String] = Map()
}
