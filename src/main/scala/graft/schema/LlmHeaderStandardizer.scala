package graft.schema

/** F24: the LLM header-rename alternative path
  * (/root/reference/src/header_standarizer_llm.py:41-230). Shares ALL of
  * the rules engine's machinery — SHA-256 memoization, collision
  * suffixing, fuzzy lookup, JSON store round-trip — by extending
  * [[HeaderRules]] and overriding only how a NEW name is generated: a
  * few-shot prompt to a text-generation model behind [[TextGenerator]],
  * then the reference's exact response-cleanup ladder.
  *
  * The model itself is environment-provided (a Spark library ships no ML
  * runtime; the reference loads a local seq2seq model): production wires
  * an HTTP or JNI-backed generator, tests a deterministic fake. Note the
  * reference prefers the rules path as more reliable
  * (header_standarizer_ruler.py:48-49); this path exists for parity and
  * for corpora whose headers the rule dictionaries don't cover.
  */
object LlmHeaderStandardizer {

  /** Text-generation seam: prompt in, raw completion out. */
  trait TextGenerator { def generate(prompt: String): String }

  /** Few-shot prompt (header_standarizer_llm.py:109-125). */
  def promptFor(header: String): String =
    s"""Simplifica este encabezado a 4-6 palabras en español, snake_case, sin tildes y uppercase:
       |Entrada: "Marca"
       |Salida: "MARCA"
       |
       |Entrada: "Emisiones de CO2 combinado (g/km)"
       |Salida: CO2_COMBINADO_GKM
       |
       |Entrada: "Artículo 4° Nonies Decreto Supremo"
       |Salida: ARTICULO_4_DS
       |
       |Entrada: "Ciclo WLTC Híbrido Recarga Exterior CO2 CS"
       |Salida: WLTC_HIB_RECARGAEXT_CO2_CS
       |
       |Entrada: "$header"
       |Salida:""".stripMargin

  /** Response cleanup (header_standarizer_llm.py:146-153): upper → first
    * line → text after the last ':' → trim → keep [alnum_] (others
    * become '_') → collapse/strip '_' runs. */
  def cleanResponse(raw: String): String = {
    var s = raw.trim.toUpperCase
    s = s.split("\n", -1).head
    // limit -1: Python's split keeps trailing empties, so a completion
    // ending in ':' (prompt-terminator echo) yields "" → hash fallback,
    // not the literal word before the colon
    s = s.split(":", -1).last.trim
    s = s.map(c => if (Character.isLetterOrDigit(c) || c == '_') c else '_')
    s.split('_').filter(_.nonEmpty).mkString("_")
  }
}

/** Drop-in alternative to the rules engine: same store, same memoization,
  * LLM-backed generation with the `col_<hash8>` fallback for empty or
  * too-short completions (header_standarizer_llm.py:155-158). */
class LlmHeaderStandardizer(
    generator: LlmHeaderStandardizer.TextGenerator,
    hashLength: Int = 12)
    extends HeaderRules(hashLength = hashLength) {

  override def generateStandardName(originalHeader: String): String = {
    val cleaned = LlmHeaderStandardizer.cleanResponse(
      generator.generate(LlmHeaderStandardizer.promptFor(originalHeader)))
    if (cleaned.length < 3) s"col_${computeHash(originalHeader).take(8)}"
    else cleaned
  }
}
