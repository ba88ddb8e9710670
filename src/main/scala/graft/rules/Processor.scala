package graft.rules

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{Expression, InterpretedProjection}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Row, SparkSession}

/**
 * Row-by-row rule evaluation without Spark jobs (reference: sparkless/
 * Processor.scala — their "sparkless" runs rules outside cluster execution
 * for unit tests and microservices). We use the active session's parser +
 * analyzer once at build time, then evaluate with an interpreted projection:
 * no jobs, no shuffles, no RDDs — each call is a pure local function.
 */
object Processor {

  final case class RuleOutcome(id: Id, setId: Id, result: Int)
  final case class SuiteOutcome(suiteId: Id, overall: Int, rules: Seq[RuleOutcome])

  /** Compile a suite against a schema into a local Row => SuiteOutcome fn. */
  def create(spark: SparkSession, schema: StructType, suite: RuleSuite): Row => SuiteOutcome = {
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val cols = suite.rules.map { case (_, r) =>
      org.apache.spark.sql.graft.Bridge.column(
        graft.functions.RuleResultCoerce(Parsing.parse(r.sql, suite)))
    }
    // resolve once through the analyzer, then strip to bound expressions
    val analyzed = empty.select(cols: _*).queryExecution.analyzed
    val resolved: Seq[Expression] = analyzed.expressions.map {
      case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
      case e => e
    }
    val attrs = analyzed.children.head.output
    val bound = resolved.map(e =>
      org.apache.spark.sql.catalyst.expressions.BindReferences.bindReference(e, attrs))
    val projection = new InterpretedProjection(bound)
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
    val ids = suite.rules.map { case (setId, r) => (setId, r.id) }

    (row: Row) => {
      val internal = toCatalyst(row).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val res = projection(internal)
      val outcomes = ids.zipWithIndex.map { case ((setId, rid), i) =>
        RuleOutcome(rid, setId, res.getInt(i))
      }
      SuiteOutcome(suite.id, overallOf(outcomes.map(_.result), suite.probablePass), outcomes)
    }
  }

  /** Same fold as the distributed runner (impl/OverallResult.scala:21-30). */
  def overallOf(results: Seq[Int], probablePass: Double): Int = {
    import RuleResults._
    results.foldLeft(PassedInt) { (acc, r) =>
      if (acc == FailedInt) FailedInt
      else if (r == PassedInt || r == SoftFailedInt || r == DisabledRuleInt) acc
      else if (r == FailedInt) FailedInt
      else if (r < probablePass * PassedInt) FailedInt
      else acc
    }
  }
}
