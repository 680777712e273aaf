package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static JVM entry points for codegen — generated code calls these
  * directly, so the expressions below stay inside whole-stage codegen
  * with no ScalaUDF closure serialization or Option boxing on the path. */
object ExprKernels {
  def unaccent(s: UTF8String): UTF8String =
    UTF8String.fromString(TextFunctions.unaccentStr(s.toString))

  def similarity(a: UTF8String, b: UTF8String): Double =
    Similarity.ratio(a.toString, b.toString)

  def jaroWinkler(a: UTF8String, b: UTF8String): Double =
    Similarity.jaroWinkler(a.toString, b.toString)

  def nfcClean(s: UTF8String): UTF8String = {
    val n = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(n.length)
    var i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      if (!Character.isISOControl(c)) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `unaccent(str)`: accent folding as a native Catalyst expression (F6).
  * null-in → null-out; codegen emits a static call. */
case class UnaccentExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    ExprKernels.unaccent(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.unaccent($c)")
  override protected def withNewChildInternal(newChild: Expression): UnaccentExpression =
    copy(child = newChild)
  override def prettyName: String = "unaccent"
}

/** `similarity_ratio(a, b)`: Ratcliff/Obershelp ratio as a native
  * expression (F14) — the fuzzy-join scorer without UDF overhead. */
case class SimilarityExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprKernels.similarity($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SimilarityExpression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "similarity_ratio"
}

/** `jaro_winkler(a, b)`: Jaro-Winkler similarity as a native
  * expression — the record-linkage scorer next to `similarity_ratio`,
  * boost threshold 0.7, prefix cap 4, p = 0.1 (DuckDB-parameterized;
  * see [[graft.functions.Similarity.jaroWinkler]]). */
case class JaroWinklerExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprKernels.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaroWinklerExpression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaro_winkler"
}

/** `nfc_clean(str)`: Unicode NFC composition + ISO-control strip (C0 +
  * C1, exactly `Character.isISOControl`) — canonical text cleanup before
  * fingerprinting/shingling so byte-different but canonically-equal
  * inputs dedup together. Matches DuckDB's
  * `regexp_replace(nfc_normalize(s), '[controls]', '', 'g')`. */
case class NfcCleanExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    ExprKernels.nfcClean(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.nfcClean($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcCleanExpression =
    copy(child = newChild)
  override def prettyName: String = "nfc_clean"
}

/** Column-level entry points + SQL registration. */
object GraftFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def unaccent_native(c: Column): Column = column(UnaccentExpression(expression(c)))
  def similarity_native(a: Column, b: Column): Column =
    column(SimilarityExpression(expression(a), expression(b)))
  def jaro_winkler(a: Column, b: Column): Column =
    column(JaroWinklerExpression(expression(a), expression(b)))
  def nfc_clean(c: Column): Column = column(NfcCleanExpression(expression(c)))

  private val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "unaccent" -> (exprs => UnaccentExpression(exprs.head)),
    "similarity_ratio" -> (exprs => SimilarityExpression(exprs(0), exprs(1))),
    "nfc_clean" -> (exprs => NfcCleanExpression(exprs.head)),
    "jaro_winkler" -> (exprs => JaroWinklerExpression(exprs(0), exprs(1))),
    "misra_gries" -> (exprs => MisraGriesAgg(exprs(0),
      exprs(1).eval().asInstanceOf[Int]).toAggregateExpression()))

  /** Register both functions on an existing session (SQL-callable). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** Session-extension hook: `SparkSession.builder()
  * .withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions`) injects the
  * engine's native functions into every session — the idiomatic
  * packaging for a Spark-native library's custom expressions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("unaccent"),
      new ExpressionInfo(classOf[UnaccentExpression].getName, "unaccent"),
      (exprs: Seq[Expression]) => UnaccentExpression(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("similarity_ratio"),
      new ExpressionInfo(classOf[SimilarityExpression].getName, "similarity_ratio"),
      (exprs: Seq[Expression]) => SimilarityExpression(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries"),
      (exprs: Seq[Expression]) => MisraGriesAgg(exprs(0),
        exprs(1).eval().asInstanceOf[Int])))
    ext.injectOptimizerRule(_ => SimilarityLengthPruning)
  }
}
