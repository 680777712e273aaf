package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Stages

/** THE golden end-to-end check: replay the derived-column stages over the
  * reference's own committed EP2 output (tmp/datos_tmp.csv — 7,569 real
  * rows, 104 standardized columns, produced by the reference's
  * pipeline_transformation) and require our re-derivations to match the
  * recorded values row-for-row.
  *
  * Derived columns (AÑO, CATEGORIA_PROPULSION, TIPO_LDV, REND_EQUIV_KML,
  * EMIS_CO2_EQUIV, the 11 per-gas means) are dropped and recomputed from
  * the surviving source columns with the exact Reference-mode stage
  * semantics; string/int columns must match exactly, doubles within 1e-6
  * (pandas float CSV round-trip), imputed means within 0.011 (engine sum
  * order at the 2-decimal rounding boundary). */
class GoldenReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val tmpCsv = "/root/reference/tmp/datos_tmp.csv"

  private val derivedDoubles = Seq(
    "REND_EQUIV_KML", "EMIS_CO2_EQUIV",
    "N2O_GKM", "MP_GKM", "NP", "HCHO_MGKM", "HC_GKM", "HC_NOX_GKM",
    "HCNM_GKM", "NMOG_NOX_GKM", "NOX_GKM", "NMOG_GKM", "CO_GKM")

  test("stage replay over the reference's committed 7,569-row output") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(tmpCsv)))
    val raw = spark.read
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(tmpCsv)
      .withColumnRenamed("_c0", "_row_idx")
      .withColumn("_row_idx", col("_row_idx").cast("long"))

    val recorded = raw.select(
      (Seq(col("_row_idx"), col("AÑO").cast("int").as("r_AÑO"),
        coalesce(col("CATEGORIA_PROPULSION"), lit("")).as("r_CATEGORIA_PROPULSION"),
        col("TIPO_LDV").as("r_TIPO_LDV")) ++
        derivedDoubles.map(c => col(c).cast("double").as(s"r_$c"))): _*)

    // drop all derived cols, re-derive with Reference-mode stages.
    // FECHA/PESO are already forward-filled in the snapshot, so the ffill
    // inside the stages is a no-op passthrough (still exercised).
    val inputs = raw.drop("AÑO" +: "CATEGORIA_PROPULSION" +: "TIPO_LDV" +: derivedDoubles: _*)
    val rederived = inputs
      .transform(Stages.transformDatetime(_))
      .transform(Stages.transformCategoria(_))
      .transform(Stages.transformPbv(_))
      .transform(Stages.transformTipoLdv(_))
      .transform(Stages.rendEquiv(_))
      .transform(Stages.co2Equiv(_))
      .transform(Stages.gasesEmissions(_))
      .transform(Stages.bevZeroAndImpute(_))

    val joined = rederived.join(recorded, "_row_idx").cache()
    assert(joined.count() == 7569)

    def mism(cond: org.apache.spark.sql.Column) = sum(when(cond, 1).otherwise(0))
    def dblMism(c: String, tol: Double) = mism(
      !(col(c).isNull && col(s"r_$c").isNull) &&
        (col(c).isNull || col(s"r_$c").isNull || abs(col(c) - col(s"r_$c")) > tol)
    ).as(c)

    val aggCols: Seq[org.apache.spark.sql.Column] =
      Seq(
        mism(col("AÑO") =!= col("r_AÑO")).as("AÑO"),
        mism(col("CATEGORIA_PROPULSION") =!= col("r_CATEGORIA_PROPULSION")).as("CATEGORIA_PROPULSION"),
        mism(!(col("TIPO_LDV").isNull && col("r_TIPO_LDV").isNull) &&
          (col("TIPO_LDV").isNull || col("r_TIPO_LDV").isNull ||
            col("TIPO_LDV") =!= col("r_TIPO_LDV"))).as("TIPO_LDV"),
        dblMism("REND_EQUIV_KML", 0.011), dblMism("EMIS_CO2_EQUIV", 0.011)) ++
        derivedDoubles.drop(2).map(c => dblMism(c, 1e-6))
    val counts = joined.agg(aggCols.head, aggCols.tail: _*).first()

    val report = counts.schema.fieldNames.zipWithIndex
      .map { case (f, i) => f -> counts.getLong(i) }
    val bad = report.filter(_._2 != 0)
    assert(bad.isEmpty, s"mismatching cells per column: ${bad.mkString(", ")}")
  }

  test("importer standardization replay matches recorded RUT/IMP_COD enrichment") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(tmpCsv)))
    val raw = spark.read.option("header", "true")
      .option("quote", "\"").option("escape", "\"").csv(tmpCsv)
      .withColumnRenamed("_c0", "_row_idx")
    val recorded = raw.select(col("_row_idx"),
      col("IMPORTADOR").as("r_IMPORTADOR"), col("RUT").as("r_RUT"),
      col("IMP_COD").as("r_IMP_COD"))
    val catalog = graft.sources.OrderedScan.csvCatalog(
      spark, "/root/reference/data/processed/bd-importadores.csv")
    val replayed = graft.ops.ImporterStandardizer
      .standardize(raw.drop("RUT", "IMP_COD"), catalog)
      .standardized.select("_row_idx", "IMPORTADOR", "RUT", "IMP_COD")

    val joined = replayed.join(recorded, "_row_idx")
    def neq(a: String, b: String) =
      !(col(a).isNull && col(b).isNull) &&
        (col(a).isNull || col(b).isNull || col(a) =!= col(b))
    val bad = joined.where(
      neq("IMPORTADOR", "r_IMPORTADOR") || neq("RUT", "r_RUT") ||
        neq("IMP_COD", "r_IMP_COD")).count()
    assert(bad == 0, s"$bad rows diverge from the recorded importer enrichment")
  }

  test("publish projection matches the published CSV header (dup folded)") {
    val published = "/root/reference/data/processed/datos3cv_2013-2026.csv"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(published)))
    val header = scala.io.Source.fromFile(published, "UTF-8")
      .getLines().next().split(",").toSeq
    assert(header.length == 35)
    // our order = reference order with the duplicated column kept once
    assert(graft.pipeline.Homologation.publishedColumns == header.distinct)
  }
}
