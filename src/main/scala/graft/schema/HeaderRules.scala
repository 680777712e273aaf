package graft.schema

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

import scala.collection.mutable
import scala.util.matching.Regex

import graft.functions.{Similarity, TextFunctions}
import graft.ops.CompatMode

/** Rule-based header standardizer (SURVEY §2 F13, F17–F22) — driver-side
  * Scala port of the semantics of
  * /root/reference/src/header_standarizer_ruler.py:45-411: normalize →
  * extract measure unit → apply domain abbreviations → extract key terms
  * with priority promotion → snake_case render → SHA-256-memoized store
  * with collision suffixing.
  *
  * Two deliberate fidelity decisions (CompatMode):
  *  - `Reference` reproduces the priority-term set EXACTLY as Python
  *    builds it, including the implicit string-literal concatenations in
  *    header_standarizer_ruler.py:67-79 ('rural'+'ponderado' →
  *    "ruralponderado", 'eu'+'rendimiento' → "eurendimiento",
  *    'pot'+'motor' → "potmotor" — so 'rural', 'ponderado', 'eu',
  *    'rendimiento', 'pot', 'motor' are NOT priority terms there).
  *  - The reference's fallback unit search iterates a Python set
  *    (nondeterministic under hash randomization); we search in a fixed
  *    longest-first, then alphabetical order.
  */
class HeaderRules(
    hashLength: Int = 12,
    maxLenHeader: Int = 10,
    mode: CompatMode = CompatMode.Reference) {

  private val priorityTerms: Set[String] = {
    val common = Set(
      "combinado", "comb", "mixto", "urbano", "urb", "carretera", "carr",
      "autopista", "autop", "ciudad",
      "pond", "ponderada", "maximo", "maxima", "minimo", "minima", "hight", "low",
      "phev", "hev", "ev", "h2",
      "cs", "cd", "epa",
      "rend", "emision", "emis", "potencia",
      "bateria", "bat", "tanque",
      "nox", "co", "co2", "hc", "hcnm", "nmog", "hc+nox", "mp", "np", "hcho",
      "n2o", "nmog+nox")
    mode match {
      case CompatMode.Reference =>
        common ++ Set("ruralponderado", "eurendimiento", "potmotor")
      case CompatMode.Intended =>
        common ++ Set("rural", "ponderado", "eu", "rendimiento", "pot", "motor")
    }
  }

  // Fallback search runs in DECLARATION order (the reference iterates a
  // Python set — nondeterministic in principle, but its production DB
  // (e.g. REND_HIGHT_H2_KG_100_KM_FCEV_VH_CELDA, where both 'kg' and
  // 'km' appear in the header) shows 'km' won, which declaration order
  // reproduces; the golden test replays all 100 entries).
  private val measureUnits: Seq[String] = Seq(
    "km", "kmh", "kml", "kmkwh",
    "kw", "kwh", "cv", "hp",
    "kg", "g", "mg", "t",
    "l", "ml", "gal", "lts",
    "m", "cm", "mm",
    "rpm", "nm", "bar", "psi",
    "gkm", "gkwh", "grkm")

  // ordered (phrase replacement happens in declaration order,
  // header_standarizer_ruler.py:218-219)
  private val specialAbbreviations: Seq[(String, String)] = Seq(
    "hibrido con recarga exterior" -> "phev",
    "hibrido sin recarga exterior" -> "hev",
    "masa de perticula" -> "mp",
    "numero de particula" -> "np",
    "norma europea" -> "emision eu",
    "norma usa epa 50 000 / 120 000 150 000 millas" -> "emision epa",
    "mantenimiento de carga" -> "manten carga",
    "sin autopista" -> "",
    "con autopista" -> "autop",
    "autopista interurbana" -> "auto interurb",
    "p b v" -> "peso bruto vh",
    "grkm" -> "gkm")

  private val abbreviations: Map[String, String] = Map(
    "articulo" -> "art", "distancia" -> "dist", "hidrogeno" -> "h2",
    "d" -> "ds", "s" -> "ds", "maxima" -> "max", "minima" -> "min",
    "decreto" -> "ds", "supremo" -> "ds", "ministerio" -> "mtt",
    "transportes" -> "mtt", "telecomunicaciones" -> "mtt",
    "vehiculo" -> "vh", "hibrido" -> "hib", "electrico" -> "ev",
    "recarga" -> "recarga", "exterior" -> "ext", "emisiones" -> "emis",
    "consumo" -> "consum", "combustible" -> "combustible",
    "rendimiento" -> "rend", "urbano" -> "urb", "autopista" -> "autop",
    "combinado" -> "comb", "ponderada" -> "pond", "categoria" -> "categoria",
    "kilometros" -> "km", "gramos" -> "g", "litros" -> "l", "litro" -> "l",
    "peso" -> "peso", "bruto" -> "bruto", "vehicular" -> "vh",
    "vehiculos" -> "vh", "sin" -> "sin", "kg" -> "kg", "duales" -> "",
    "gasolina" -> "gasol", "europea" -> "eur", "homologacion" -> "homl",
    "estandar" -> "estd", "superior" -> "sup", "potencia" -> "pot")

  private val removePatterns: Seq[Regex] = Seq(
    "\\(", "\\)", "\\*+", "°", "\\d{1,3}/\\d{2,4}", "[\\n\\r\\t]+",
    "[_\\-]{1,}", "[\\.,]").map(_.r)

  private val stopwords = Set(
    "de", "del", "la", "el", "los", "las", "un", "una", "y", "o",
    "en", "con", "sin", "por", "para", "a", "al", "se", "su",
    "que", "es", "son", "esta", "este", "mediante", "segun", "nonies",
    "ciclo", "condicion", "puro", "entre")

  private val unitPattern: Regex = "\\(?\\b([a-zA-Z]+\\d*(?:/[a-zA-Z]+\\d*)+)\\b\\)?".r

  /** std_name → (original_names, hashes); insertion-ordered. */
  val mappings: mutable.LinkedHashMap[String, (mutable.Buffer[String], mutable.Buffer[String])] =
    mutable.LinkedHashMap.empty

  /** F13: truncated SHA-256 memo key (header_standarizer_ruler.py:173-175). */
  def computeHash(text: String): String = {
    val d = MessageDigest.getInstance("SHA-256")
      .digest(text.getBytes(StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString.take(hashLength)
  }

  /** F17: lower → strip patterns → unaccent → collapse whitespace. */
  def normalizeText(text: String): String = {
    var t = text.toLowerCase
    removePatterns.foreach(p => t = p.replaceAllIn(t, " "))
    t = TextFunctions.unaccentStr(t)
    t.split("\\s+").filter(_.nonEmpty).mkString(" ")
  }

  /** F19: unit via slash pattern on the ORIGINAL header, else first known
    * unit word (fixed order). */
  def extractMeasureUnit(text: String): Option[String] =
    unitPattern.findFirstMatchIn(text).map(_.group(1).toLowerCase.replace("/", ""))
      .orElse {
        val lower = text.toLowerCase
        measureUnits.find(u => s"\\b$u\\b".r.findFirstIn(lower).isDefined)
      }

  /** F18: longest-phrase replacements, then per-word dictionary map. */
  def applyAbbreviations(text: String): String = {
    var t = text
    specialAbbreviations.foreach { case (k, v) => t = t.replace(k, v) }
    t.split("\\s+").filter(_.nonEmpty)
      .map(w => abbreviations.getOrElse(w, w))
      .mkString(" ")
  }

  /** F20: priority-term promotion + stopword removal, ordered dedup,
    * capped at maxTerms. */
  def extractKeyTerms(text: String, maxTerms: Int): Seq[String] = {
    val words = text.split("\\s+").filter(_.nonEmpty).toSeq
    val priorityFound = words.filter(priorityTerms.contains).distinct
    val regular = words.filter(w =>
      !stopwords.contains(w) && !priorityTerms.contains(w) && w.length > 1).distinct
    (priorityFound ++ regular).take(maxTerms)
  }

  /** F21: snake_case render with ordered dedup and hash fallback. */
  def toSnakeCase(words: Seq[String]): String = {
    var snake = words.distinct.mkString("_")
    snake = snake.replaceAll("[^a-z0-9_]", "_")
    snake = snake.replaceAll("_+", "_")
    snake.stripPrefix("_").stripSuffix("_")
  }

  def generateStandardName(originalHeader: String): String = {
    val normalized = normalizeText(originalHeader)
    val measureUnit = extractMeasureUnit(originalHeader)
    val cleaned = measureUnit match {
      case Some(_) => unitPattern.replaceAllIn(normalized, "")
      case None    => normalized
    }
    val abbreviated = applyAbbreviations(cleaned)
    val maxTerms =
      if (measureUnit.isDefined)
        math.min(abbreviated.split("\\s+").count(_.nonEmpty), maxLenHeader)
      else maxLenHeader
    val keyTerms = extractKeyTerms(abbreviated, maxTerms) ++ measureUnit
    val snake = toSnakeCase(keyTerms)
    val name = if (snake.length < 3) s"col_${computeHash(originalHeader).take(8)}" else snake
    name.toUpperCase
  }

  /** F26-corrected hash-membership lookup: full scan over all entries
    * (the reference's check returns after the first dict entry —
    * transform_headers.py:105-109 — which is a latent bug we do not copy). */
  private def lookupByHash(h: String): Option[String] =
    mappings.collectFirst { case (std, (_, hashes)) if hashes.contains(h) => std }

  /** Standardize one header, memoized; F22 collision suffixing. */
  def standardizeHeader(originalHeader: String): String = {
    val h = computeHash(originalHeader)
    lookupByHash(h).getOrElse {
      val base = generateStandardName(originalHeader)
      var name = base
      var counter = 1
      while (mappings.contains(name)) { name = s"${base}_$counter"; counter += 1 }
      mappings(name) = (mutable.Buffer(originalHeader), mutable.Buffer(h))
      name
    }
  }

  /** Batch form; persistence is BATCHED by the caller (one save per run),
    * not per-header like the reference's O(n²)-IO write loop
    * (header_standarizer_ruler.py:396). */
  def batchStandardize(headers: Seq[String]): Map[String, String] =
    headers.map(hd => hd -> standardizeHeader(hd)).toMap

  /** J3: fuzzy schema-match lookup (transform_headers.py:120-129) — when
    * a header's hash is unknown, try similarity ≥ `threshold` against
    * every registered ORIGINAL name (junk chars space/newline stripped,
    * like the reference's SequenceMatcher junk set) and reuse that
    * standard name. Driver-side: ≤hundreds × hundreds of short strings.
    * The reference's interactive console fallback (F25) is replaced by
    * returning None — callers fail fast with a report, keeping runs
    * headless (SURVEY §7 hard-part 5). */
  def fuzzyLookup(header: String, threshold: Double = 0.9): Option[String] = {
    def strip(s: String) = s.filterNot(c => c == ' ' || c == '\n')
    val candidates = for {
      (std, (origs, _)) <- mappings.toSeq
      orig <- origs
    } yield (std, Similarity.ratio(strip(header), strip(orig)))
    candidates.sortBy { case (std, score) => (-score, std) }
      .headOption.collect { case (std, score) if score > threshold => std }
  }
}

/** S5/S10/S11: the persistent JSON mapping store
  * `{STD_NAME: {original_names: [...], hashes: [...]}}`
  * (header_standarizer_ruler.py:177-193) and its CSV export. Jackson is
  * on the Spark classpath. */
object MappingStore {
  import com.fasterxml.jackson.databind.ObjectMapper
  import com.fasterxml.jackson.databind.node.ObjectNode
  private val om = new ObjectMapper()

  def load(path: Path, into: HeaderRules): Unit = {
    if (!Files.exists(path)) return
    val root = om.readTree(Files.readString(path))
    val it = root.fields()
    while (it.hasNext) {
      val e = it.next()
      val orig = mutable.Buffer.empty[String]
      val hashes = mutable.Buffer.empty[String]
      e.getValue.get("original_names").forEach(n => orig += n.asText())
      e.getValue.get("hashes").forEach(n => hashes += n.asText())
      into.mappings(e.getKey) = (orig, hashes)
    }
  }

  def save(rules: HeaderRules, path: Path): Unit = {
    val root = om.createObjectNode()
    rules.mappings.foreach { case (std, (orig, hashes)) =>
      val entry: ObjectNode = root.putObject(std)
      val a1 = entry.putArray("original_names"); orig.foreach(a1.add)
      val a2 = entry.putArray("hashes"); hashes.foreach(a2.add)
    }
    if (path.getParent != null) Files.createDirectories(path.getParent)
    Files.writeString(path, om.writerWithDefaultPrettyPrinter().writeValueAsString(root))
  }

  /** S11: flatten to (standard_name, original_name, hash) CSV rows. */
  def exportCsv(rules: HeaderRules, path: Path): Unit = {
    def q(s: String) = "\"" + s.replace("\"", "\"\"") + "\""
    val rows = rules.mappings.toSeq.flatMap { case (std, (orig, hashes)) =>
      orig.zip(hashes).map { case (o, h) => s"${q(std)},${q(o)},${q(h)}" }
    }
    if (path.getParent != null) Files.createDirectories(path.getParent)
    Files.writeString(path,
      ("standard_name,original_name,hash" +: rows).mkString("\n") + "\n")
  }
}
