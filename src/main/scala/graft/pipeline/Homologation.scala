package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{CompatMode, ImporterStandardizer, Stages}
import graft.schema.{HeaderIdentify, HeaderRules}

/** EP2/EP3: the end-to-end homologation transformation
  * (/root/reference/src/transform_pipeline.py:218-251 and
  * /root/reference/src/load_to_gcp.py:64-92) as one lazy DataFrame chain.
  *
  * Header identification/standardization is a driver-side pre-pass over
  * the collected ≤10-row prefix (provably tiny); its outputs — the rename
  * map and `maxrow` — are baked into the plan as literals. Everything
  * after is pure Catalyst: one scan, no collect, a single tiny agg for
  * the imputation means, and a broadcast join for importers.
  */
object Homologation {

  val categoryColumns: Seq[String] = Seq(
    "PROPULSION", "COMBUSTIBLE", "CATEGORIA_VH", "IMPORTADOR",
    "MARCA", "MODELO", "EMIS_NORMA", "TIPO_CARROCERIA")

  /** The 35 published columns, in order (load_to_gcp.py:30-42; header of
    * data/processed/datos3cv_2013-2026.csv). The reference lists
    * EMISION_NPS_KM_EU_KM twice — Spark forbids duplicate output names,
    * so we publish it once (documented deviation, SURVEY §2 S8),
    * yielding 34 distinct columns. */
  val publishedColumns: Seq[String] = Seq(
    "MARCA", "MODELO", "CODIGO_INFORME_TECNICO", "FECHA_HOML", "FOOT_PRINT_MT2",
    "AÑO", "TIPO_LDV", "CATEGORIA_PROPULSION", "RUT", "IMP_COD", "EMIS_NORMA",
    "CATEGORIA_VH", "PESO_BRUTO_VH_KG", "TRANSMISION",
    "EMIS_CO2_EQUIV", "REND_EQUIV_KML",
    "N2O_EMISION_EPA", "MP_EMISION_EPA_MASA_PARTICULAS_GKM", "HCHO_EMISION_EPA_MGKM",
    "HC_EMISION_EPA_GKM", "HCNM_EMISION_EPA_GKM", "NMOG_NOX_EMISION_EPA",
    "NOX_EMISION_EPA_GKM", "NMOG_EMISION_EPA_GKM", "CO_EMISION_EPA_GKM",
    "HCHO_EMISION_EU_MGKM", "EMISION_NPS_KM_EU_KM", "HC_NOX_EMISION_EU_GKM",
    "NMOG_EMISION_EU_GKM", "HCNM_EMISION_EU_GKM", "CO_EMISION_EU_GKM",
    "MP_EMISION_MASA_PARTICULAS_EU_GKM", "NOX_EMISION_EU_GKM", "HC_EMISION_EU_GKM")

  /** transform_headers (transform_pipeline.py:153-179): identify the
    * multi-row header block, standardize names through the memoized rules
    * engine, rename, and slice away the header area. Collisions (several
    * raw columns mapping to one standard name) keep the first occurrence
    * — the deterministic stand-in for the reference's Python-set column
    * order (SURVEY §2 U2). */
  def transformHeaders(
      grid: DataFrame,
      rules: HeaderRules,
      orderCol: String = "_row_idx"): DataFrame = {
    val ident = HeaderIdentify.identifyGrid(grid, orderCol)
    val flatNames = ident.names.map(_._2)
    val stdMap = rules.batchStandardize(flatNames)
    val dataCols = grid.columns.filterNot(_ == orderCol)
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    val selected = ident.names.flatMap { case (idx, flat) =>
      val std = stdMap(flat)
      if (seen.add(std)) Some(col(dataCols(idx)).as(std)) else None
    }
    grid
      .where(col(orderCol) >= ident.maxrow + 2)
      .select(selected :+ col(orderCol): _*)
  }

  /** pipeline_transformation (transform_pipeline.py:218-251). `catalog`
    * is the importer master table (bd-importadores).
    *
    * `cache=true` persists the staged table so the imputation-mean agg
    * and the caller's terminal action share one computation of the
    * header+transform chain; the cache is owned by the returned
    * `Result.release()` — call it after the terminal action (cached
    * blocks otherwise accumulate across grids in a long-lived session).
    * `cache=false` skips the persist entirely (right for tiny demo grids
    * and for one-shot runs where recompute beats disk-backed caching). */
  def pipeline(
      grid: DataFrame,
      rules: HeaderRules,
      catalog: DataFrame,
      mode: CompatMode = CompatMode.Reference,
      cache: Boolean = true): ImporterStandardizer.Result = {
    val chain = transformHeaders(grid, rules)
      .transform(Stages.transformDatetime(_))
      .transform(Stages.transformCategoryCols(_, categoryColumns))
      .transform(Stages.transformCombustible(_))
      .transform(Stages.transformCategoria(_))
      .transform(Stages.transformPbv(_))
      .transform(Stages.transformTipoLdv(_))
      .transform(Stages.rendEquiv(_, mode = mode))
      .transform(Stages.co2Equiv(_))
      .transform(Stages.gasesEmissions(_))
    val staged =
      if (cache) chain.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else chain
    val df = Stages.bevZeroAndImpute(staged)
    val r = ImporterStandardizer.standardize(df, catalog)
    if (cache) r.copy(release = () => { staged.unpersist(); () }) else r
  }

  /** EP3 publish projection: present published columns only, in order
    * (load_to_gcp.py:57-59). */
  def publishProjection(df: DataFrame): DataFrame =
    df.select(publishedColumns.filter(df.columns.contains).map(col): _*)

  /** A2: year range for the published filename (load_to_gcp.py:47-55). */
  def yearRange(df: DataFrame, yearCol: String = "AÑO"): (Int, Int) = {
    val r = df.agg(min(col(yearCol)), max(col(yearCol))).first()
    (r.getInt(0), r.getInt(1))
  }
}
