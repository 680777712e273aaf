package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.{LlmHeaderStandardizer, MappingStore}

/** F24: LLM header-rename path — memoization, the reference's response
  * cleanup ladder, hash fallback, collision suffixing, store sharing.
  * The generator is a deterministic fake (no ML runtime in a Spark
  * library); the seam is what's under test. */
class LlmHeaderStandardizerSpec extends AnyFunSuite {

  private class FakeGen(reply: String => String) extends LlmHeaderStandardizer.TextGenerator {
    var calls = 0
    def generate(prompt: String): String = {
      calls += 1
      // the prompt embeds the header as the last quoted Entrada
      val header = """Entrada: "([^"]*)"\s*\nSalida:\s*$""".r
        .findFirstMatchIn(prompt).get.group(1)
      reply(header)
    }
  }

  test("cleanup ladder: upper, first line, after-last-colon, alnum/_, collapse") {
    import LlmHeaderStandardizer.cleanResponse
    assert(cleanResponse("  salida: Co2 Combinado (g/km)\nresiduo") == "CO2_COMBINADO_G_KM")
    assert(cleanResponse("\"MARCA\"") == "MARCA")
    assert(cleanResponse("a: b: PESO__BRUTO__VH ") == "PESO_BRUTO_VH")
    assert(cleanResponse("") == "")
    // prompt-terminator echo: text after the LAST colon is empty → must
    // clean to "" (→ hash fallback), like Python's split()[-1]
    assert(cleanResponse("Salida:") == "")
    assert(cleanResponse("SALIDA: MARCA:") == "")
  }

  test("memoizes by hash: the model is consulted once per distinct header") {
    val gen = new FakeGen(h => s"STD_${h.take(4).toUpperCase}")
    val std = new LlmHeaderStandardizer(gen)
    assert(std.standardizeHeader("Emisiones de CO2 (g/km)") == "STD_EMIS")
    assert(std.standardizeHeader("Emisiones de CO2 (g/km)") == "STD_EMIS")
    assert(gen.calls == 1)
  }

  test("too-short completion falls back to col_<hash8>") {
    val std = new LlmHeaderStandardizer(new FakeGen(_ => "x"))
    val name = std.standardizeHeader("Algo muy raro")
    assert(name.startsWith("col_") && name.length == 12, name)
  }

  test("collisions get numeric suffixes; store round-trips via MappingStore") {
    val gen = new FakeGen(_ => "MISMO_NOMBRE")
    val std = new LlmHeaderStandardizer(gen)
    assert(std.standardizeHeader("Encabezado uno") == "MISMO_NOMBRE")
    assert(std.standardizeHeader("Encabezado dos") == "MISMO_NOMBRE_1")

    val path = java.nio.file.Files.createTempDirectory("llm-store").resolve("m.json")
    MappingStore.save(std, path)
    val reloaded = new LlmHeaderStandardizer(new FakeGen(_ => "NUNCA_LLAMADO"))
    MappingStore.load(path, reloaded)
    assert(reloaded.standardizeHeader("Encabezado dos") == "MISMO_NOMBRE_1")
  }

  test("offline generator: deterministic template execution of the prompt") {
    import LlmHeaderStandardizer.OfflineTextGenerator
    val std = new LlmHeaderStandardizer(OfflineTextGenerator)
    // unaccent + stopword drop + uppercase + snake_case
    assert(std.standardizeHeader("Emisiones de CO2 combinado (g/km)")
      == "EMISIONES_CO2_COMBINADO_G_KM")
    assert(std.standardizeHeader("Fecha de Homologación") == "FECHA_HOMOLOGACION")
    // 6-word cap — the prompt's "4-6 palabras"
    assert(std.standardizeHeader(
      "Rendimiento Eléctrico (km/kwh) Vehículo Eléctrico Puro Adicional Extra")
      == "RENDIMIENTO_ELECTRICO_KM_KWH_VEHICULO_ELECTRICO")
    // the few-shot abbreviations apply
    assert(std.standardizeHeader("Ciclo WLTC Híbrido Recarga Exterior CO2 CS")
      == "CICLO_WLTC_HIB_RECARGA_EXT_CO2")
    // same header, same name — the property the memo store depends on
    assert(OfflineTextGenerator.generate(
      LlmHeaderStandardizer.promptFor("P.B.V. (kg)")) ==
      OfflineTextGenerator.generate(LlmHeaderStandardizer.promptFor("P.B.V. (kg)")))
    // empty / symbol-only headers clean to "" → col_<hash8> fallback
    assert(std.standardizeHeader("¿¿??").startsWith("col_"))
  }
}
