package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StructType}

/** `injectParser` leg of the §2.12 extension matrix — the last of the four
  * Catalyst seams (function / optimizer rule / planner strategy / parser),
  * wired in `graft.GraftExtensions`. Adds ONE statement form Spark's
  * grammar lacks, the as-of join:
  *
  * {{{
  * SELECT * FROM <probe> ASOF [BACKWARD|FORWARD|NEAREST] JOIN <build>
  *   ON KEYS (k1[, k2...]) MATCH <ts> [TOLERANCE 'INTERVAL ...']
  * }}}
  *
  * and delegates EVERYTHING else to Spark's own parser untouched — the
  * standard extension-parser idiom (a thin delegating wrapper owning a
  * narrow grammar island, as lakehouse formats do for their DDL). The
  * matched statement resolves both table names through the session
  * catalog, builds the same [[GraftAsOfJoin]] logical node as the
  * `AsOf.join` Scala API, and thus flows through the injected
  * [[RewriteGraftAsOfJoin]] lowering — one grammar, two front ends, one
  * plan. Keys and timestamp are same-named on both sides in the SQL form
  * (the Scala API keeps the fully general pairing).
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val AsOfStmt =
    ("""(?is)\s*SELECT\s+\*\s+FROM\s+([\w.]+)\s+ASOF(?:\s+(BACKWARD|FORWARD|NEAREST))?\s+JOIN\s+([\w.]+)""" +
      """\s+ON\s+KEYS\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\)\s+MATCH\s+(\w+)""" +
      """(?:\s+TOLERANCE\s+'([^']+)')?\s*""").r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case AsOfStmt(probe, dirOrNull, build, keyCsv, ts, tolOrNull) =>
      val keys = keyCsv.split(",").map(_.trim).toSeq
      val direction =
        Option(dirOrNull).map(_.toLowerCase).getOrElse("backward")
      val tolerance = Option(tolOrNull)
      Bridge.planOf(AsOf.join(
        session.table(probe), session.table(build),
        keys, ts, keys, ts, direction, tolerance))
    case _ => delegate.parsePlan(sqlText)
  }

  // MUST forward explicitly: the interface default would re-route through
  // our parsePlan and drop the bound-parameter context (breaking EXECUTE
  // IMMEDIATE / parameterized sql()); the island never carries parameters
  override def parsePlanWithParameters(
      sqlText: String,
      parameters: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    sqlText match {
      case AsOfStmt(_*) => parsePlan(sqlText)
      case _ => delegate.parsePlanWithParameters(sqlText, parameters)
    }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
