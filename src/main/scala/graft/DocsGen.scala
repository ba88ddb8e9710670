package graft

/**
 * In-build generator for the SQL function INDEX in docs/sqlfunctions.md
 * (the reference ships a complete sqlfunctions.md; graft's curated
 * tables carry the descriptions, and this generator keeps the page
 * provably COMPLETE): the alphabetical index between the GENERATED
 * markers is rendered straight from [[graft.functions.Registry
 * .registeredNames]], and DocsParitySpec fails the build when either
 * the index is stale or a registered function is missing from the
 * curated tables above it.
 *
 * Usage: sbt -batch "runMain graft.DocsGen"   (rewrites docs/sqlfunctions.md)
 */
object DocsGen {

  val Begin = "<!-- BEGIN GENERATED INDEX (graft.DocsGen — do not edit by hand) -->"
  val End = "<!-- END GENERATED INDEX -->"

  /** The generated index block: every registered snake_case name (each
   * also callable via its underscore-free alias), 4 per row. */
  def indexMarkdown: String = {
    val names = graft.functions.Registry.registeredNames
    val rows = names.map("`" + _ + "`").grouped(4)
      .map(g => "| " + g.padTo(4, " ").mkString(" | ") + " |")
    // plain line assembly — stripMargin over interpolated table rows
    // would eat each row's leading '|' as a margin character
    (Seq(Begin, "",
      s"## Complete index (${names.size} functions, generated)", "",
      "Every SQL-callable function in the Registry, alphabetical; each name",
      "also registers an underscore-free alias (`soft_fail` / `softfail`).", "",
      "| | | | |", "| --- | --- | --- | --- |") ++
      rows ++ Seq("", End)).mkString("\n")
  }

  /** Splice [[indexMarkdown]] into the page: replaces an existing
   * generated block, or appends one. */
  def render(page: String): String = {
    val b = page.indexOf(Begin)
    val e = page.indexOf(End)
    if (b >= 0 && e >= 0)
      page.substring(0, b) + indexMarkdown + page.substring(e + End.length)
    else page.stripTrailing() + "\n\n" + indexMarkdown + "\n"
  }

  def main(args: Array[String]): Unit = {
    val path = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "docs/sqlfunctions.md")
    val page = java.nio.file.Files.readString(path)
    java.nio.file.Files.writeString(path, render(page))
    println(s"[docsgen] wrote ${path} (" +
      s"${graft.functions.Registry.registeredNames.size} functions)")
  }
}
