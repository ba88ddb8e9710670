package graft.rules

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Expression, LambdaFunction => CatalystLambda, UnresolvedNamedLambdaVariable}
import org.apache.spark.sql.graft.Bridge

/**
 * SQL lambda functions stored as data (reference: docs/advanced/userFunctions.md,
 * impl/RuleImpl.scala LambdaFunctionImpl).
 *
 * Spark-first design difference: instead of a runtime function-forwarding
 * expression family (the reference's FunN/FunForward), lambdas are expanded by
 * *parse-time macro substitution* — a call site `myFun(x, y)` inside any rule
 * is replaced by the lambda body with parameters substituted. The resulting
 * plan is plain Catalyst, fully analyzable and optimizable, with zero runtime
 * dispatch overhead.
 *
 * Partial application: a call site may pass `_()` placeholders; the result is
 * a Catalyst lambda usable where higher-order functions expect one, e.g.
 * `aggregate(arr, 0L, myFun(_(), _()))`.
 */
object Lambdas {

  final case class Parsed(params: Seq[String], body: Expression)

  /** Parse a stored lambda SQL: either `(a, b) -> expr`, `a -> expr`, or a
   * zero-arg plain expression. */
  def parse(sql: String): Parsed =
    Bridge.parse(DocsParsing.stripComments(sql)) match {
      case CatalystLambda(body, args, _) =>
        Parsed(args.map(a => a.name), body)
      case e => Parsed(Seq.empty, e)
    }

  /** name → arity → body: same-name lambdas with different parameter counts
   * overload, like the reference (docs/advanced/userFunctions.md:42). */
  def toMap(fns: Seq[LambdaFunction]): Map[String, Map[Int, Parsed]] =
    fns.groupBy(_.name.toLowerCase).map { case (n, fs) =>
      n -> fs.map { f => val p = parse(f.sql); p.params.size -> p }.toMap
    }

  private val MaxDepth = 64

  /** Expand all registered lambda call sites in an expression tree. */
  def substitute(expr: Expression, lambdas: Map[String, Map[Int, Parsed]], depth: Int = 0): Expression = {
    if (lambdas.isEmpty) return expr
    if (depth > MaxDepth)
      throw new IllegalArgumentException(
        s"lambda expansion exceeded depth $MaxDepth - recursive lambda definitions are not supported")
    expr.transformUp {
      // callFun(<lambda-valued expression>, args...): apply a partial
      // returned by a lambda (curried lambdas expand to nested arrows)
      case uf: UnresolvedFunction if fnName(uf) == "callfun" || fnName(uf) == "call_fun" =>
        uf.arguments.head match {
          case CatalystLambda(body, params, _) =>
            val args = uf.arguments.tail
            if (args.size != params.size)
              throw new IllegalArgumentException(
                s"callFun: partial expects ${params.size} args, got ${args.size}")
            substitute(bindParams(body, params.map(_.name).zip(args).toMap), lambdas, depth + 1)
          case other =>
            throw new IllegalArgumentException(
              s"callFun's first argument must be a lambda-valued expression, got $other")
        }
      case uf: UnresolvedFunction if lambdas.contains(fnName(uf)) =>
        val byArity = lambdas(fnName(uf))
        val args = uf.arguments
        val lam = byArity.getOrElse(args.size,
          throw new IllegalArgumentException(
            s"lambda ${fnName(uf)} has arities ${byArity.keys.toSeq.sorted.mkString("/")}, got ${args.size} args"))
        if (args.exists(isPlaceholder))
          partialApply(lam, args, lambdas, depth)
        else
          substitute(bindParams(lam.body, lam.params.zip(args).toMap), lambdas, depth + 1)
    }
  }

  private def fnName(uf: UnresolvedFunction): String = uf.nameParts.last.toLowerCase

  /** What the session-registered `_` function resolves to: the analyzer
   * resolves `_()` before the enclosing lambda call reaches its builder, and
   * a builder only fires once its children are RESOLVED — so the marker must
   * be a resolved leaf. It is always consumed by the enclosing lambda
   * builder; evaluating one means `_()` was used outside a lambda call. */
  private[rules] case class PlaceholderExpression()
      extends org.apache.spark.sql.catalyst.expressions.LeafExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def nullable: Boolean = true
    override def dataType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.NullType
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      throw new IllegalStateException(
        "_() placeholder used outside a registered lambda call")
  }

  private def isPlaceholder(e: Expression): Boolean = e match {
    case uf: UnresolvedFunction => fnName(uf) == "_" && uf.arguments.isEmpty
    case PlaceholderExpression() => true
    case _ => false
  }

  /**
   * Session-global lambda registration (reference:
   * impl/imports/LambdaFunctionsImports.scala:17-18 registerLambdaFunctions):
   * stored lambdas become callable from ANY `spark.sql(...)` string — not just
   * inside suite-parsed rules. Nested lambda calls in bodies expand through
   * the same parse-time substitution, so the resulting plans are identical to
   * rule-embedded usage. Re-registering a name replaces it (latest wins).
   */
  def registerLambdaFunctions(spark: org.apache.spark.sql.SparkSession, fns: Seq[LambdaFunction]): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    val byName = toMap(fns)
    val reg = spark.sessionState.functionRegistry
    byName.foreach { case (name, byArity) =>
      val builder: Seq[Expression] => Expression = args => {
        val lam = byArity.getOrElse(args.size,
          throw new IllegalArgumentException(
            s"lambda $name has arities ${byArity.keys.toSeq.sorted.mkString("/")}, got ${args.size} args"))
        if (args.exists(isPlaceholder)) partialApply(lam, args, byName, 0)
        else substitute(bindParams(lam.body, lam.params.zip(args).toMap), byName, 1)
      }
      reg.registerFunction(
        FunctionIdentifier(name), new ExpressionInfo("graft.rules.Lambdas", name), builder)
    }
    if (byName.nonEmpty)
      reg.registerFunction(
        FunctionIdentifier("_"), new ExpressionInfo("graft.rules.Lambdas", "_"),
        args => {
          require(args.isEmpty, "placeholder _() takes no arguments")
          PlaceholderExpression()
        })
  }

  /** `myFun(_(), lit)` → Catalyst lambda `(p0) -> body[param0 := p0, param1 := lit]`. */
  private def partialApply(
      lam: Parsed, args: Seq[Expression],
      lambdas: Map[String, Map[Int, Parsed]], depth: Int): Expression = {
    if (args.size != lam.params.size)
      throw new IllegalArgumentException(
        s"partial application expects ${lam.params.size} args, got ${args.size}")
    val fresh = args.zipWithIndex.collect {
      case (a, i) if isPlaceholder(a) =>
        i -> UnresolvedNamedLambdaVariable(Seq(s"graft_ph_$i"))
    }.toMap
    val substArgs = args.zipWithIndex.map { case (a, i) => fresh.getOrElse(i, a) }
    val bound = bindParams(lam.body, lam.params.zip(substArgs).toMap)
    CatalystLambda(substitute(bound, lambdas, depth + 1), fresh.values.toSeq.sortBy(_.name))
  }

  /** Replace parameter references in a lambda body with argument expressions.
   * Matches simple attributes and dotted paths rooted at a parameter
   * (`a.field` → extract field from the substituted arg). */
  def bindParams(body: Expression, params: Map[String, Expression]): Expression = {
    val ci = params.map { case (k, v) => k.toLowerCase -> v }
    def extract(parts: Seq[String]): Expression =
      parts.tail.foldLeft(ci(parts.head.toLowerCase)) { (e, field) =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(
          e, org.apache.spark.sql.catalyst.expressions.Literal(field))
      }
    body.transformUp {
      case UnresolvedAttribute(parts) if ci.contains(parts.head.toLowerCase) =>
        extract(parts)
      // arrow-syntax bodies wrap references as lambda variables, incl. dotted
      // paths (`acc.amount` → UnresolvedNamedLambdaVariable(Seq(acc, amount)))
      case UnresolvedNamedLambdaVariable(parts) if ci.contains(parts.head.toLowerCase) =>
        extract(parts)
    }
  }
}
