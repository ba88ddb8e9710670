package graft.rules

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Config-table-driven temp view registration (reference: impl/views/
 * ViewLoading.scala, docs/advanced/viewLoader.md). Each config row names a
 * view backed either by a loader token (a user function resolving named
 * sources) or by a SQL text; views may reference previously-loaded views.
 */
object ViewLoader {

  /** Resolves tokens to DataFrames — the reference's DataFrameLoader. */
  trait DataFrameLoader extends Serializable {
    def load(token: String): DataFrame
  }

  final case class ViewConfig(name: String, token: Option[String], filter: Option[String], sql: Option[String])

  final case class ViewLoadResults(loadedViews: Set[String], notLoaded: Set[String], replaced: Set[String])

  /** Read view configs from a config DataFrame by naming its columns. */
  def loadViewConfigs(
      df: DataFrame, name: Column, token: Column, filter: Column, sql: Column): Seq[ViewConfig] =
    df.select(name.as("n"), token.as("t"), filter.as("f"), sql.as("s")).collect().map { r =>
      ViewConfig(r.getString(0), Option(r.getString(1)), Option(r.getString(2)), Option(r.getString(3)))
    }.toSeq

  /** Suite-scoped variant (reference ViewLoaderImports.loadViewConfigs):
   * only rows whose (ruleSuiteId, ruleSuiteVersion) match `ruleSuiteId`. */
  def loadViewConfigs(
      df: DataFrame, ruleSuiteIdColumn: Column, ruleSuiteVersionColumn: Column,
      ruleSuiteId: Id, name: Column, token: Column, filter: Column, sql: Column): Seq[ViewConfig] =
    loadViewConfigs(
      df.where(ruleSuiteIdColumn === ruleSuiteId.id &&
        ruleSuiteVersionColumn === ruleSuiteId.version),
      name, token, filter, sql)

  /** Register each config as a temp view; token + optional filter, or sql.
   * Views may depend on OTHER config-loaded views in any config order
   * (reference impl/views/ViewLoading.scala resolves nested tokens the same
   * way): configs that fail to analyze are retried after each pass until a
   * fixpoint — only views that never resolve land in notLoaded.
   * Returns which views loaded / were replaced / could not load. */
  def loadViews(spark: SparkSession, loader: DataFrameLoader, configs: Seq[ViewConfig]): ViewLoadResults = {
    var loaded = Set.empty[String]
    var replaced = Set.empty[String]
    val noSource = configs.filter(c => c.token.isEmpty && c.sql.isEmpty).map(_.name).toSet
    var pending = configs.filterNot(c => noSource(c.name))
    var progress = true
    while (progress && pending.nonEmpty) {
      progress = false
      pending = pending.filterNot { c =>
        try {
          val d = (c.token, c.sql) match {
            case (Some(t), _) =>
              val base = loader.load(t)
              c.filter.map(base.where).getOrElse(base)
            case (None, Some(s)) => spark.sql(s)
            case _ => throw new IllegalStateException("unreachable: filtered above")
          }
          if (spark.catalog.tableExists(c.name)) replaced += c.name
          d.createOrReplaceTempView(c.name)
          loaded += c.name
          progress = true
          true
        } catch {
          // likely a dependency on a not-yet-loaded view: retry next pass
          case scala.util.control.NonFatal(_) => false
        }
      }
    }
    ViewLoadResults(loaded, noSource ++ pending.map(_.name), replaced)
  }
}
