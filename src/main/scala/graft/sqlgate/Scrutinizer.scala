package graft.sqlgate

import java.util.regex.{Matcher, Pattern}

import scala.annotation.tailrec

import org.apache.spark.sql.catalyst.analysis.{UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.parser.{CatalystSqlParser, ParseException}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._

/** 400-style rejection from the SQL gate (reference raises
  * HTTPException(status_code=400, detail=...)). */
final case class SqlGateException(detail: String, statusCode: Int = 400)
    extends RuntimeException(detail)

/** The SQL dialect gate: validate, constrain, and safely rewrite a
  * user-supplied SQL query.
  *
  * Re-implements the contract of the reference's `scrutinize_sql`
  * (`app/routes/datasets/utils/query_helpers.py:274-381`), enforcing —
  * with the reference's exact error strings — that the SQL:
  *   - contains exactly one statement
  *   - is a SELECT query
  *   - has no WITH clause
  *   - references exactly one table in the FROM clause
  *   - has no subqueries in FROM
  *   - calls no forbidden functions (prefixes "pg_", "_", "postgis" +
  *     the admin/system blocklist) and no SQL value functions
  *
  * Unlike the reference (pglast parse → AST edit → RawStream serialize),
  * we validate on Spark's *unresolved* logical plan and rewrite on the
  * original text: a regex FROM-replace (ported from
  * `query_helpers.py:384-437`) plus a textual WHERE splice for the AOI
  * filter (`query_helpers.py:238-266`). Benign queries therefore pass
  * through byte-exact, which the reference's golden tests
  * (`test_query_helpers.py:14-35`) require.
  */
object Scrutinizer {

  /** Reference-parity entry point: returns SQL targeting
    * `dataset.version` (quoted when the version contains dots). */
  def scrutinize(dataset: String, version: String,
                 geometryGeoJson: Option[String], sql: String): String = {
    val fromPart =
      if (version.contains("."))
        s"${quoteIdent(dataset)}.${quoteIdent(version)}"
      else s"$dataset.$version"
    scrutinizeTo(fromPart, geometryGeoJson, sql)
  }

  /** Core: validate `sql` and rewrite its FROM target to `fromPart`
    * (e.g. a Spark temp-view name for execution). */
  def scrutinizeTo(fromPart: String, geometryGeoJson: Option[String],
                   sql: String): String = {
    // Reference parses `unquote(sql)` (percent-decoding).
    var text = percentDecode(sql).trim
    // RawStream never emits trailing semicolons; nor do we.
    text = text.replaceAll("[;\\s]+$", "")

    val masked = maskQuoted(text)
    requireSingleStatement(masked)
    requireSelectKeyword(text, masked)
    // PG's SQLValueFunctions are keywords used *without* parentheses;
    // scanned textually because Spark parses some as plain attributes.
    requireNoValueFunctions(masked)

    val plan = parse(text)
    plan.foreach {
      case _: UnresolvedWith =>
        throw SqlGateException("Must not have WITH clause.")
      case _: Command =>
        throw SqlGateException("Must use SELECT statements only.")
      case _ =>
    }

    val alias = checkFromShape(plan)
    checkFunctions(plan)

    val aliasSql = alias.map(a => s" AS $a").getOrElse("")
    val withGeom = geometryGeoJson match {
      case Some(gj) => spliceGeometryFilter(text, gj)
      case None => text
    }
    replaceFromClause(s"$fromPart$aliasSql", withGeom)
  }

  // ---------------------------------------------------------------- parse

  private def parse(text: String): LogicalPlan =
    try CatalystSqlParser.parsePlan(pgQuotesToBackticks(text))
    catch {
      case e: ParseException =>
        val idx = math.max(0, e.origin.startPosition.getOrElse(0))
        val at = math.min(idx, math.max(0, text.length - 1))
        val tok = text.drop(at)
          .takeWhile(c => c.isLetterOrDigit || c == '_' || c == '$')
        val token = if (tok.isEmpty) text.drop(at).take(1) else tok
        throw SqlGateException(
          s"""syntax error at or near "$token", at index $at""")
    }

  // ----------------------------------------------------------- validators

  private def requireSingleStatement(masked: String): Unit = {
    val parts = masked.split(";", -1)
    if (parts.count(_.trim.nonEmpty) > 1)
      throw SqlGateException("Must use exactly one SQL statement.")
  }

  /** PG classifies statements by node type; textually, anything not
    * starting SELECT/WITH/VALUES/TABLE/( is not a SelectStmt. */
  private def requireSelectKeyword(text: String, masked: String): Unit = {
    val kw = masked.trim.takeWhile(c => c.isLetterOrDigit || c == '_')
      .toLowerCase
    val ok = kw == "select" || kw == "with" || kw == "values" ||
      kw == "table" || masked.trim.startsWith("(")
    if (!ok && parseErrorFree(text)) // gibberish falls through to parse()
      throw SqlGateException("Must use SELECT statements only.")
  }

  private def parseErrorFree(text: String): Boolean =
    try { CatalystSqlParser.parsePlan(pgQuotesToBackticks(text)); true }
    catch { case _: ParseException => false }

  private val ValueFunctions = Pattern.compile(
    "(?i)\\b(current_catalog|current_date|current_role|current_schema|" +
      "current_time|current_timestamp|current_user|localtime|" +
      "localtimestamp|session_user|user)\\b(?!\\s*\\()")

  private def requireNoValueFunctions(masked: String): Unit =
    if (ValueFunctions.matcher(masked).find())
      throw SqlGateException("Use of sql value functions is not allowed.")

  /** Walk the FROM subtree: exactly one plain (optionally aliased)
    * relation. Returns the table alias if present. */
  private def checkFromShape(plan: LogicalPlan): Option[String] = {
    @tailrec def fromRoot(p: LogicalPlan): LogicalPlan = p match {
      case s: SubqueryAlias => s
      case j: Join => j
      case r: UnresolvedRelation => r
      case _ if p.children.size == 1 => fromRoot(p.children.head)
      case _ => p
    }
    fromRoot(plan) match {
      case _: UnresolvedRelation => None
      case SubqueryAlias(id, _: UnresolvedRelation) => Some(id.name)
      case _: SubqueryAlias =>
        throw SqlGateException("Must not use sub queries.")
      case Join(_, _, Inner, None, _) =>
        // comma-separated FROM list (PG: >1 fromClause items)
        throw SqlGateException("Must list exactly one table in FROM clause.")
      case _: Join =>
        // explicit JOIN: PG passes the from-count check (one JoinExpr)
        // but fails alias capture (query_helpers.py:352-355)
        throw SqlGateException("Unexpected FROM clause structure.")
      case _ =>
        // no FROM at all (OneRowRelation / VALUES / set operations)
        throw SqlGateException("Must list exactly one table in FROM clause.")
    }
  }

  private def checkFunctions(plan: LogicalPlan): Unit = {
    def walkExpr(e: Expression): Unit = e.foreach {
      case f: UnresolvedFunction =>
        val name = f.nameParts.last.toLowerCase
        if (name.startsWith("pg_") || name.startsWith("_") ||
          name.startsWith("postgis") || ForbiddenFunctions.names(name))
          throw SqlGateException(
            "Use of admin, system or private functions is not allowed.")
      case s: SubqueryExpression => walkPlan(s.plan)
      case _ =>
    }
    def walkPlan(p: LogicalPlan): Unit =
      p.foreach(node => node.expressions.foreach(walkExpr))
    walkPlan(plan)
  }

  // ------------------------------------------------------------ rewriting

  /** Ported from the reference's `_replace_from_clause` regex
    * (`query_helpers.py:424-429`): replaces only the table identifier
    * (and optional alias) immediately following FROM, preserving
    * WHERE/GROUP/ORDER/LIMIT tails. */
  private val FromPattern = Pattern.compile(
    "from\\s+[\\w.\"]+(?:\\s+(?:AS\\s+)?\\w+)?" +
      "(?=\\s*(?:WHERE|JOIN|ON|GROUP\\b|ORDER\\b|LIMIT\\b|OFFSET\\b|" +
      "FETCH\\b|FOR\\b|;|\\)|$))",
    Pattern.CASE_INSENSITIVE)

  private def replaceFromClause(fromPart: String, sqlIn: String): String =
    FromPattern.matcher(sqlIn)
      .replaceAll(Matcher.quoteReplacement(s"FROM $fromPart"))

  /** AND the AOI intersects-filter into the WHERE clause
    * (`query_helpers.py:238-266`); filter text matches the reference's
    * serialized form. Semantics: intersecting features are returned
    * whole, not clipped (`queries.py:88-94`).
    *
    * The user's GeoJSON is canonicalized through the geometry parser
    * first — only type + numeric coordinates survive into the SQL
    * literal, mirroring the reference's validated Pydantic `Geometry`
    * model; without this a crafted string property could break out of
    * the quoted literal and smuggle SQL past the gate. The residual
    * quote-escape is belt and braces (canonical output has no `'`). */
  private def spliceGeometryFilter(text: String, geojson: String): String = {
    val canonical =
      try graft.geo.Geom.toGeoJson(graft.geo.Geom.fromGeoJson(geojson))
      catch {
        case e: Exception => throw SqlGateException(
          s"Invalid geometry: ${Option(e.getMessage).getOrElse("unparseable GeoJSON")}")
      }
    val filter =
      s"st_intersects(geom, st_setsrid(st_geomfromgeojson('${canonical.replace("'", "''")}'), 4326))"
    val masked = maskQuoted(text)
    val tailPos = firstTailKeyword(masked).getOrElse(text.length)
    wherePosition(masked) match {
      case Some(wEnd) =>
        val pred = text.substring(wEnd, tailPos)
        val needsParens = hasTopLevelOr(masked.substring(wEnd, tailPos))
        val newPred =
          if (needsParens) s" (${pred.trim}) AND $filter"
          else s" ${pred.trim} AND $filter"
        text.substring(0, wEnd) + newPred +
          (if (tailPos < text.length) " " + text.substring(tailPos).trim
           else "")
      case None =>
        val head = text.substring(0, tailPos).replaceAll("\\s+$", "")
        val tail =
          if (tailPos < text.length) " " + text.substring(tailPos).trim
          else ""
        s"$head WHERE $filter$tail"
    }
  }

  /** First depth-0 match of `p` in `masked`, by start offset. */
  private def depth0Find(masked: String, p: Pattern): Option[Int] = {
    val depthBefore = new Array[Int](masked.length)
    var d = 0
    var i = 0
    while (i < masked.length) {
      depthBefore(i) = d
      masked.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
      }
      i += 1
    }
    val m = p.matcher(masked)
    while (m.find()) if (depthBefore(m.start()) == 0) return Some(m.start())
    None
  }

  private val WherePattern = Pattern.compile("(?i)\\bwhere\\b")
  private val TailKeyword = Pattern.compile(
    "(?i)\\b(group|order|limit|offset|fetch|for|window|union|intersect|except)\\b")
  private val OrPattern = Pattern.compile("(?i)\\bor\\b")

  /** Offset just past the depth-0 WHERE keyword, if any. */
  private def wherePosition(masked: String): Option[Int] =
    depth0Find(masked, WherePattern).map(_ + 5)

  private def firstTailKeyword(masked: String): Option[Int] =
    depth0Find(masked, TailKeyword)

  private def hasTopLevelOr(maskedPred: String): Boolean =
    depth0Find(maskedPred, OrPattern).isDefined

  // ------------------------------------------------------------- lexing

  /** Replace the contents of single-quoted strings, double-quoted
    * identifiers and backticked identifiers with spaces, preserving
    * length, so keyword scans can't match inside literals. */
  private[sqlgate] def maskQuoted(s: String): String = {
    val out = s.toCharArray
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case q @ ('\'' | '"' | '`') =>
          var j = i + 1
          var done = false
          while (j < s.length && !done) {
            if (s.charAt(j) == q) {
              if (j + 1 < s.length && s.charAt(j + 1) == q) j += 2 // escaped
              else done = true
            } else j += 1
          }
          val end = math.min(j, s.length - 1)
          var k = i + 1
          while (k < end) { out(k) = ' '; k += 1 }
          i = end + 1
        case _ => i += 1
      }
    }
    new String(out)
  }

  /** Convert PG-style double-quoted identifiers to Spark backticks for
    * parsing (the rewrite still runs on the original text). */
  private[sqlgate] def pgQuotesToBackticks(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => // copy string literal verbatim
          val start = i
          i += 1
          while (i < s.length && (s.charAt(i) != '\'' ||
            (i + 1 < s.length && s.charAt(i + 1) == '\'' && { i += 1; true })))
            i += 1
          i = math.min(i + 1, s.length)
          sb.append(s.substring(start, i))
        case '"' =>
          var j = i + 1
          val ident = new StringBuilder
          var done = false
          while (j < s.length && !done) {
            if (s.charAt(j) == '"') {
              if (j + 1 < s.length && s.charAt(j + 1) == '"') {
                ident.append('"'); j += 2
              } else done = true
            } else { ident.append(s.charAt(j)); j += 1 }
          }
          sb.append('`').append(ident.toString.replace("`", "``")).append('`')
          i = j + 1
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** Python-urllib-style percent decoding: valid %XX escapes decode,
    * anything else (lone %, bad hex, +) passes through unchanged. */
  private[sqlgate] def percentDecode(s: String): String = {
    val bytes = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
        isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else {
        val enc = c.toString.getBytes("UTF-8")
        bytes.write(enc, 0, enc.length)
        i += 1
      }
    }
    new String(bytes.toByteArray, "UTF-8")
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def quoteIdent(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""
}
