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

  /** Text-generation seam: prompt in, raw completion out.
    *
    * Model-environment contract: production supplies an implementation
    * backed by whatever serving stack the deployment has (an HTTP
    * endpoint, a JNI-bound local model — the reference loads a local
    * seq2seq model in-process, header_standarizer_llm.py:64-70); this
    * library deliberately ships no ML runtime. [[OfflineTextGenerator]]
    * is the batteries-included default for demos, tests, and air-gapped
    * runs. */
  trait TextGenerator { def generate(prompt: String): String }

  /** Deterministic offline [[TextGenerator]]: executes the prompt's own
    * instruction ("4-6 palabras en español, snake_case, sin tildes,
    * uppercase") as a template instead of sampling a model — unaccent,
    * drop Spanish function words, abbreviate the domain terms the
    * few-shot examples demonstrate, cap at 6 tokens. Same header in,
    * same name out, forever: exactly the property the memoized mapping
    * store wants, and the reference itself notes the deterministic
    * rules path is MORE reliable than the model
    * (header_standarizer_ruler.py:48-49). */
  object OfflineTextGenerator extends TextGenerator {
    private val stop = Set("DE", "DEL", "LA", "EL", "LOS", "LAS", "EN",
      "Y", "A", "O", "U", "POR", "CON", "PARA", "AL", "UN", "UNA")
    // the abbreviations the few-shot examples teach the model
    private val abbrev = Map(
      "HIBRIDO" -> "HIB", "EXTERIOR" -> "EXT", "RECARGA" -> "RECARGA",
      "DECRETO" -> "DS", "SUPREMO" -> "")

    def generate(prompt: String): String = {
      // the header under generation is the LAST quoted Entrada
      val entrada = "(?s).*Entrada: \"([^\"]*)\"\\s*\\n\\s*Salida:\\s*$".r
      val header = prompt match {
        case entrada(h) => h
        case _ => prompt // free-form use: treat the whole input as the header
      }
      val un = java.text.Normalizer.normalize(header, java.text.Normalizer.Form.NFD)
        .replaceAll("\\p{M}", "")
      val words = un.toUpperCase
        .map(c => if (Character.isLetterOrDigit(c)) c else ' ')
        .split("\\s+").filter(_.nonEmpty)
        .filterNot(stop)
        .map(w => abbrev.getOrElse(w, w)).filter(_.nonEmpty)
      words.take(6).mkString("_")
    }
  }

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
