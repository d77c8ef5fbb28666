package graft.raster

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiler for the reference's `calc` numpy-expression DSL into Spark
  * columns over tile arrays (SURVEY §2.6 "OTF calc DSL";
  * `app/routes/datasets/queries.py:721-774`,
  * `creation_options.py:149-176`).
  *
  * Supported surface — the forms the reference actually ships:
  *   - arithmetic over band variables `A`, `B` (density rescale
  *     `A * area`, date part `A % 10000`, confidence part
  *     `floor(A / 10000)`), numeric literals, parentheses
  *   - `.astype(<type>)` suffix → SQL CAST (uint8/int16/… → int types,
  *     float32/float64 → double)
  *   - comparisons (`>= > <= < == !=`) for mask-building calcs
  *
  * Compilation strategy: the scalar expression is translated textually
  * to Spark SQL (numpy and SQL share infix syntax for this subset),
  * then wrapped element-wise over the tile arrays — `transform` for
  * one band, `zip_with` for two. numpy's datetime64 date codecs are
  * NOT parsed: the engine synthesizes date/conf derived layers
  * structurally (see RasterQueries), matching how the reference's
  * query layer special-cases them.
  */
object CalcDsl {

  private val TypeMap = Map(
    "bool" -> "boolean", "uint8" -> "int", "int8" -> "int",
    "uint16" -> "int", "int16" -> "int", "uint32" -> "bigint",
    "int32" -> "bigint", "float16" -> "double", "float32" -> "double",
    "float64" -> "double")

  /** Variables referenced by a calc string (single uppercase letters,
    * reference convention A, B, …). */
  def variables(calc: String): Seq[String] =
    "(?<![A-Za-z_])([A-Z])(?![A-Za-z_(])".r
      .findAllMatchIn(calc).map(_.group(1)).toSeq.distinct.sorted

  /** Translate the numpy scalar expression to a Spark SQL scalar
    * expression (astype → CAST, == → =). */
  private[raster] def toSql(calc: String): String = {
    var s = calc.trim
    // x.astype('t') / x.astype(t): the reference only uses
    // whole-expression casts.
    val astype = "^(.*)\\.astype\\(\\s*'?\"?([a-z0-9]+)'?\"?\\s*\\)\\s*$".r
    s = s match {
      case astype(inner, t) =>
        val sqlT = TypeMap.getOrElse(t,
          throw new IllegalArgumentException(s"unsupported astype('$t')"))
        s"CAST((${inner.trim}) AS $sqlT)"
      case other => other
    }
    // numpy floor division `//` → SQL DIV (exact on the non-negative
    // integer layer domain; caught by CalcPropertySpec)
    s.replace("//", " DIV ").replace("==", "=")
  }

  /** Compile `calc` into the SQL text of an element-wise expression
    * over tile arrays. `bands` maps calc variable → array-column SQL
    * name. Up to two distinct variables (the reference's envelope). */
  def compileSql(calc: String, bands: Map[String, String]): String = {
    val vars = variables(calc)
    val scalar = toSql(calc)
    vars match {
      case Seq() =>
        throw new IllegalArgumentException(s"calc '$calc' references no band")
      case Seq(a) =>
        s"transform(${bands(a)}, $a -> $scalar)"
      case Seq(a, b) =>
        s"zip_with(${bands(a)}, ${bands(b)}, ($a, $b) -> $scalar)"
      case more =>
        throw new IllegalArgumentException(
          s"calc '$calc' uses ${more.size} bands; at most 2 supported")
    }
  }

  /** Column form of [[compileSql]]. */
  def compile(calc: String, bands: Map[String, String]): Column =
    expr(compileSql(calc, bands))
}
