package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.{HeaderRules, MappingStore}

/** F13/F17–F22 golden tests: replay the reference's demo fixture
  * (/root/reference/src/header_standarizer_ruler.py:434-442) and the
  * full production mapping DB
  * (/root/reference/data/processed/campos_hom_data.json), asserting the
  * rules engine regenerates the recorded standard names. */
class HeaderRulesSpec extends AnyFunSuite {

  test("demo fixture headers standardize to recorded names") {
    val rules = new HeaderRules()
    // first and third demo headers exist in the production DB:
    assert(rules.standardizeHeader(
      "Artículo 4° Nonies, D.S. 211/91 Ministerio de Transportes y Telecomunicaciones (Estándar Superior)")
      == "ART_DS_MTT_ESTD_SUP")
    assert(rules.standardizeHeader("Categoría vehículo") == "CATEGORIA_VH")
  }

  test("hash memoization returns cached name without regeneration") {
    val rules = new HeaderRules()
    val first = rules.standardizeHeader("CO2 combinado (g/km)")
    assert(rules.standardizeHeader("CO2 combinado (g/km)") == first)
    assert(rules.mappings.size == 1)
  }

  test("collision suffixing appends _1, _2") {
    val rules = new HeaderRules()
    val a = rules.standardizeHeader("Potencia máxima (kW)")
    val b = rules.standardizeHeader("Potencia  máxima  (kW)") // same words, new hash
    assert(b == s"${a}_1")
  }

  test("short names fall back to col_<hash8>") {
    val rules = new HeaderRules()
    val n = rules.standardizeHeader("de")
    assert(n.startsWith("COL_"))
  }

  test("regenerates the full production mapping DB") {
    val dbPath = Paths.get("/root/reference/data/processed/campos_hom_data.json")
    assume(Files.exists(dbPath))
    val recorded = new HeaderRules()
    MappingStore.load(dbPath, recorded)
    val replay = new HeaderRules()
    val diffs = recorded.mappings.toSeq.flatMap { case (std, (origs, _)) =>
      val got = replay.standardizeHeader(origs.head)
      if (got != std) Some(s"$std != $got  <- ${origs.head.take(60)}") else None
    }
    assert(diffs.isEmpty, s"${diffs.size} mismatches:\n${diffs.mkString("\n")}")
  }

  test("fuzzy lookup (J3) reuses a registered name for a drifted header") {
    val rules = new HeaderRules()
    rules.standardizeHeader("CO2 combinado (g/km)")
    // drifted re-publication of the same header: extra whitespace/newline
    assert(rules.fuzzyLookup("CO2  combinado\n(g/km)", threshold = 0.9)
      .contains(rules.standardizeHeader("CO2 combinado (g/km)")))
    // unrelated header finds nothing → caller fails fast (F25 replacement)
    assert(rules.fuzzyLookup("Totally different header", threshold = 0.9).isEmpty)
  }

  test("mapping store round-trips JSON and exports CSV") {
    val rules = new HeaderRules()
    rules.standardizeHeader("CO2 combinado (g/km)")
    rules.standardizeHeader("Categoría vehículo")
    val dir = Files.createTempDirectory("maps")
    val json = dir.resolve("maps.json")
    MappingStore.save(rules, json)
    val loaded = new HeaderRules()
    MappingStore.load(json, loaded)
    assert(loaded.mappings.keySet == rules.mappings.keySet)
    val csv = dir.resolve("maps.csv")
    MappingStore.exportCsv(rules, csv)
    val lines = Files.readAllLines(csv)
    assert(lines.get(0) == "standard_name,original_name,hash")
    assert(lines.size() == 3)
  }
}
