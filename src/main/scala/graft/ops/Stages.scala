package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Whether quirky reference behaviors are reproduced bit-for-bit
  * (`Reference`) or replaced by the evidently intended semantics
  * (`Intended`). See SURVEY.md §2.8 F12 quirks a–d.
  */
sealed trait CompatMode
object CompatMode {
  case object Reference extends CompatMode
  case object Intended extends CompatMode
}

/** The typed column-transform layer (SURVEY §2 F1–F12, A1, A3) as pure
  * `DataFrame => DataFrame` stages, composable with `df.transform(...)`.
  * Each stage mirrors a function in
  * /root/reference/src/transform_pipeline.py (cited per stage) but is
  * expressed as lazy Catalyst expressions: constant-foldable CASE trees,
  * coerce-to-null casts, and window-based forward fill — no row-at-a-time
  * code, so the whole layer stays inside whole-stage codegen.
  */
object Stages {

  /** F1: sentinel `'-'` → NULL (transform_pipeline.py:38,50,122,143). */
  def sentinelToNull(c: Column, sentinel: String = "-"): Column =
    when(c === sentinel, lit(null)).otherwise(c)

  /** F4: string→double with coerce-to-null on garbage
    * (pd.to_numeric(errors="coerce"), transform_pipeline.py:52,123).
    * try_cast is ANSI-mode-independent, so the stage behaves identically
    * under a caller-provided ANSI session. */
  def tryDouble(c: Column): Column = c.try_cast("double")

  private def tryDoubleOf(name: String): Column =
    nullif(col(name), lit("-")).try_cast("double")

  /** transform_datetime (transform_pipeline.py:34-43): `'-'`→NULL, ffill
    * over file order, cast to date, derive AÑO. Requires `orderCol` (the
    * explicit row index threaded from the scan — SURVEY §4). */
  def transformDatetime(
      df: DataFrame,
      column: String = "FECHA_HOML",
      yearCol: String = "AÑO",
      orderCol: String = "_row_idx"): DataFrame = {
    val filled = Ffill.ffill(
      df.withColumn(column, sentinelToNull(col(column))),
      orderCol, Seq(column))
    filled
      .withColumn(column, to_timestamp(col(column)))
      .withColumn(yearCol, year(col(column)))
  }

  /** transform_pbv (transform_pipeline.py:46-53): `'-'`→NULL, ffill, to
    * numeric. */
  def transformPbv(
      df: DataFrame,
      column: String = "PESO_BRUTO_VH_KG",
      orderCol: String = "_row_idx"): DataFrame = {
    val filled = Ffill.ffill(
      df.withColumn(column, sentinelToNull(col(column))),
      orderCol, Seq(column))
    filled.withColumn(column, tryDouble(col(column)))
  }

  /** Replace `targets` in place via one `select` projection. A
    * per-column `withColumn` fold adds one Project (and one full
    * analyzer pass) per column — on the ~100-derived-column pipeline
    * that driver-side plan-compile tax dominated small-grid latency. */
  private def replaceColumns(df: DataFrame, targets: Set[String])(
      f: String => Column): DataFrame =
    if (targets.isEmpty) df
    else df.select(df.columns.toIndexedSeq.map(c =>
      if (targets(c)) f(c).as(c) else col(c)): _*)

  /** transform_category_cols (transform_pipeline.py:55-66): NULL→"",
    * lower, unaccent, trim — for each present column (one projection). */
  def transformCategoryCols(df: DataFrame, columns: Seq[String]): DataFrame =
    replaceColumns(df, columns.filter(df.columns.contains).toSet)(c =>
      TextFunctions.normalizeCategory(coalesce(col(c), lit(""))))

  /** transform_combustible (transform_pipeline.py:68-74): lower+unaccent,
    * empty→"electrico". */
  def transformCombustible(df: DataFrame, column: String = "COMBUSTIBLE"): DataFrame =
    df.withColumn(column, {
      val v = TextFunctions.unaccent(lower(col(column)))
      when(v === "", "electrico").otherwise(v)
    })

  /** F11: transform_categoria (transform_pipeline.py:77-89) — propulsion
    * string → bev/ice/hev/h2/phev, default empty string. */
  def propulsionCategory(c: Column): Column =
    when(c.isin("vehiculo electrico"), "bev")
      .when(c.isin("combustion", "electrico de rango extendido"), "ice")
      .when(c.isin("vehiculos hibridos sin recarga exterior"), "hev")
      .when(c.isin("vehiculos celda de hidrogeno"), "h2")
      .when(c.isin("vehiculos hibridos con recarga exterior",
                   "electrico hibrido con recarga exterior"), "phev")
      .otherwise("")

  def transformCategoria(
      df: DataFrame,
      column: String = "PROPULSION",
      newcol: String = "CATEGORIA_PROPULSION"): DataFrame =
    df.withColumn(newcol, propulsionCategory(col(column)))

  /** F11: transform_tipe_ldv (transform_pipeline.py:188-193) — gross
    * weight → liviano/mediano (NULL above 3860, like the reference). */
  def transformTipoLdv(
      df: DataFrame,
      column: String = "PESO_BRUTO_VH_KG",
      newcol: String = "TIPO_LDV"): DataFrame =
    df.withColumn(column, col(column).cast("double"))
      .withColumn(newcol,
        when(col(column) < 2700, "liviano")
          .when(col(column) >= 2700 && col(column) < 3860, "mediano"))

  // ------------------------------------------------------------------
  // F12: column-keyed dispatch trees (get_rend_equiv / get_co2_emiss)
  // ------------------------------------------------------------------

  /** PROPULSION → source rend column (transform_pipeline.py:100-108).
    * Quirk a, as the DATA resolves it (verified against the reference's
    * committed tmp/datos_tmp.csv): the real corpus uses the SINGULAR
    * `"vehiculos hibrido con recarga exterior"` — so the map key the
    * survey flagged as misspelled matches production rows, while
    * transform_categoria's PLURAL mask is the one that misses (204 rows
    * with empty CATEGORIA_PROPULSION in the reference output). Both
    * modes therefore keep the singular key; Intended additionally maps
    * the plural spelling. */
  private def propRendSource(mode: CompatMode): Map[String, String] = {
    val base = Map(
      "combustion" -> "MIXTO_REND_COMBUSTIBLE_KML",
      "vehiculo electrico" -> "REND_EV_VH_KMKWH",
      "vehiculos hibrido con recarga exterior" -> "COMB_REND_WLTC_KML",
      "electrico hibrido con recarga exterior" -> "COMB_REND_WLTC_KML",
      "vehiculos hibridos sin recarga exterior" -> "MIXTO_REND_COMBUSTIBLE_KML",
      "vehiculos celda de hidrogeno" -> "REND_LOW_H2_KG_100_KM_FCEV_VH_CELDA",
      "electrico de rango extendido" -> "MIXTO_REND_COMBUSTIBLE_KML")
    mode match {
      case CompatMode.Reference => base
      case CompatMode.Intended =>
        base + ("vehiculos hibridos con recarga exterior" -> "COMB_REND_WLTC_KML")
    }
  }

  /** COMBUSTIBLE → conversion factor (transform_pipeline.py:109-117;
    * `"hidrogreno"` typo kept in Reference mode, spelled right in
    * Intended). */
  private def combFactor(mode: CompatMode): Map[String, Double] = {
    val h2Key = mode match {
      case CompatMode.Reference => "hidrogreno"
      case CompatMode.Intended  => "hidrogeno"
    }
    Map(
      "gasolina" -> 1.0, "diesel" -> 0.87, "electrico" -> 8.60,
      h2Key -> 374.96, "gasolina/glp" -> 1.0, "gasolina/gnc" -> 1.0,
      "gasolina/hibrido" -> 1.0)
  }

  private val glpCol = "MIXTO_REND_GASOL_VH_GLP_GNC_KML"

  /** get_rend_equiv (transform_pipeline.py:96-130). The reference's
    * dict-of-loops (49 masked UPDATEs with repeated re-parses of the same
    * source columns) folds into ONE constant-foldable CASE tree:
    * source column chosen by COMBUSTIBLE override (glp/gnc — and, via
    * quirk b's loop-carried overwrite, gasolina/hibrido in Reference
    * mode) else by PROPULSION; factor chosen by COMBUSTIBLE; value
    * assigned only when both keys match; round(2). Also materializes the
    * numeric form of every touched source column, as the reference does. */
  def rendEquiv(
      df: DataFrame,
      newcol: String = "REND_EQUIV_KML",
      mode: CompatMode = CompatMode.Reference): DataFrame = {
    val props = propRendSource(mode)
    val factors = combFactor(mode)
    val overrideCombs = mode match {
      case CompatMode.Reference => Seq("gasolina/glp", "gasolina/gnc", "gasolina/hibrido")
      case CompatMode.Intended  => Seq("gasolina/glp", "gasolina/gnc")
    }
    val touched = (props.values.toSeq :+ glpCol).distinct.filter(df.columns.contains)
    val withNumeric = replaceColumns(df, touched.toSet)(tryDoubleOf)

    val srcVal: Column = {
      val byProp = props.filter { case (_, c) => df.columns.contains(c) }
        .foldLeft(lit(null).cast("double")) { case (acc, (p, c)) =>
          when(col("PROPULSION") === p, col(c)).otherwise(acc)
        }
      if (df.columns.contains(glpCol))
        when(col("COMBUSTIBLE").isin(overrideCombs: _*), col(glpCol)).otherwise(byProp)
      else byProp
    }
    val factor: Column = factors.foldLeft(lit(null).cast("double")) {
      case (acc, (comb, f)) => when(col("COMBUSTIBLE") === comb, lit(f)).otherwise(acc)
    }
    val propOk = col("PROPULSION").isin(props.keys.toSeq: _*)
    withNumeric.withColumn(newcol,
      round(when(propOk && factor.isNotNull, srcVal * factor), 2))
  }

  /** get_co2_emiss (transform_pipeline.py:132-151): COMBUSTIBLE → source
    * CO₂ column; the `"vehiculo electrico"` zeroing branch is dead in the
    * reference (key absent from the map) — BEV zeroing happens in
    * [[bevZeroAndImpute]], matching transform_pipeline.py:243. */
  def co2Equiv(
      df: DataFrame,
      newcol: String = "EMIS_CO2_EQUIV"): DataFrame = {
    val mapping = Seq(
      "diesel" -> "EMIS_CO2_GKM",
      "gasolina" -> "EMIS_CO2_GKM",
      "gasolina/glp" -> "CO2_VH_GASOL_GLP_GNC_GRKM",
      "gasolina/gnc" -> "CO2_VH_GASOL_GLP_GNC_GRKM",
      "electrico" -> "EMIS_CO2_GKM",
      "gasolina/hibrido" -> "CO2_PHEV_REND_PONDERADO_VH_GKM",
      "hidrogeno" -> "EMIS_CO2_GKM")
    val present = mapping.filter { case (_, c) => df.columns.contains(c) }
    val withNumeric = replaceColumns(df, present.map(_._2).toSet)(tryDoubleOf)
    val value = present.foldLeft(lit(null).cast("double")) {
      case (acc, (comb, c)) => when(col("COMBUSTIBLE") === comb, col(c)).otherwise(acc)
    }
    withNumeric.withColumn(newcol, value)
  }

  /** A3: get_gases_emissions (transform_pipeline.py:195-214) — per-gas
    * row-wise mean with pandas semantics: NaN counts as 0 and the
    * denominator is the FIXED column count, not the non-null count. */
  def gasesEmissions(df: DataFrame): DataFrame = {
    val gases = Seq(
      "N2O_GKM" -> Seq("N2O_EMISION_EPA"),
      "MP_GKM" -> Seq("MP_EMISION_EPA_MASA_PARTICULAS_GKM", "MP_EMISION_MASA_PARTICULAS_EU_GKM"),
      "NP" -> Seq("EMISION_NPS_KM_EU_KM", "EPA_NPS_KM_NORMA_USA_KM"),
      "HCHO_MGKM" -> Seq("HCHO_EMISION_EPA_MGKM", "HCHO_EMISION_EU_MGKM"),
      "HC_GKM" -> Seq("HC_EMISION_EPA_GKM", "HC_EMISION_EU_GKM"),
      "HC_NOX_GKM" -> Seq("HC_NOX_EMISION_EU_GKM"),
      "HCNM_GKM" -> Seq("HCNM_EMISION_EPA_GKM"),
      "NMOG_NOX_GKM" -> Seq("NMOG_NOX_EMISION_EPA"),
      "NOX_GKM" -> Seq("NOX_EMISION_EPA_GKM", "NOX_EMISION_EU_GKM"),
      "NMOG_GKM" -> Seq("NMOG_EMISION_EPA_GKM", "NMOG_EMISION_EU_GKM"),
      "CO_GKM" -> Seq("CO_EMISION_EPA_GKM", "CO_EMISION_EU_GKM"))
    val present = gases
      .map { case (newcol, listcols) => (newcol, listcols.filter(df.columns.contains)) }
      .filter(_._2.nonEmpty)
    if (present.isEmpty) return df
    // two projections total (convert sources in place, add the gas
    // means) instead of one Project per converted column per gas
    val converted = replaceColumns(df, present.flatMap(_._2).toSet)(c => tryDouble(col(c)))
    def gasCol(newcol: String, used: Seq[String]): Column = {
      val sum = used.map(c => coalesce(col(c), lit(0.0))).reduce(_ + _)
      (sum / lit(used.size.toDouble)).as(newcol)
    }
    // a gas target already present in the input is REPLACED in place
    // (withColumn semantics), never emitted twice
    val gasMap = present.toMap
    val existing = converted.columns.toIndexedSeq.map(c =>
      gasMap.get(c).map(gasCol(c, _)).getOrElse(col(c)))
    val appended = present.collect {
      case (n, used) if !converted.columns.contains(n) => gasCol(n, used)
    }
    converted.select(existing ++ appended: _*)
  }

  /** A1 + BEV zeroing (transform_pipeline.py:243-245): zero CO₂ for BEVs,
    * then impute remaining NULLs in both derived measures with the
    * rounded global mean. The mean is a tiny scalar agg (one extra job
    * over two columns — parquet-pruned), then folded in as a literal so
    * the main plan stays a single pass. */
  def bevZeroAndImpute(
      df: DataFrame,
      co2Col: String = "EMIS_CO2_EQUIV",
      rendCol: String = "REND_EQUIV_KML",
      categoryCol: String = "CATEGORIA_PROPULSION"): DataFrame = {
    val zeroed = df.withColumn(co2Col,
      when(col(categoryCol) === "bev", 0.0).otherwise(col(co2Col)))
    val row = zeroed.agg(
      round(avg(col(co2Col)), 2).as("m1"),
      round(avg(col(rendCol)), 2).as("m2")).first()
    val d2 = if (row.isNullAt(0)) zeroed
      else zeroed.withColumn(co2Col, coalesce(col(co2Col), lit(row.getDouble(0))))
    if (row.isNullAt(1)) d2
    else d2.withColumn(rendCol, coalesce(col(rendCol), lit(row.getDouble(1))))
  }

  /** A1 as a standalone reusable stage: impute NULLs with round(mean, 2). */
  def meanImpute(df: DataFrame, column: String, scale: Int = 2): DataFrame = {
    val row = df.agg(round(avg(col(column)), scale)).first()
    if (row.isNullAt(0)) df
    else df.na.fill(row.getDouble(0), Seq(column))
  }
}
