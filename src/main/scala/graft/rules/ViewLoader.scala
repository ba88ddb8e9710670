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
   * Returns which views loaded / were replaced / could not load. */
  def loadViews(spark: SparkSession, loader: DataFrameLoader, configs: Seq[ViewConfig]): ViewLoadResults = {
    var loaded = Set.empty[String]
    var failed = Set.empty[String]
    var replaced = Set.empty[String]
    configs.foreach { c =>
      val df: Option[DataFrame] = (c.token, c.sql) match {
        case (Some(t), _) =>
          val base = loader.load(t)
          Some(c.filter.map(base.where).getOrElse(base))
        case (None, Some(s)) => Some(spark.sql(s))
        case _ => None
      }
      df match {
        case Some(d) =>
          if (spark.catalog.tableExists(c.name)) replaced += c.name
          d.createOrReplaceTempView(c.name)
          loaded += c.name
        case None => failed += c.name
      }
    }
    ViewLoadResults(loaded, failed, replaced)
  }
}
