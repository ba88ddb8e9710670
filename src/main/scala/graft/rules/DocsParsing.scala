package graft.rules

/**
 * Doc-comment parsing for rule / lambda / output-expression SQL texts
 * (reference: impl/util/DocsParsing.scala:1-180). A stored expression may
 * carry a leading scaladoc-style comment — opener `/`+`**`, a description,
 * `@param name text` entries, `@return text`, closer `*`+`/` — followed by
 * the SQL itself.
 *
 * `parse` extracts the structured Docs, `stripComments` returns the bare SQL
 * (the parse pipeline strips automatically, so documented rules run as-is).
 * Leading ` * ` continuation prefixes are removed scaladoc-style; a body
 * whose lines don't all start with `*` is treated as markdown and kept.
 */
object DocsParsing {

  final case class Docs(
      description: String = "",
      params: Map[String, String] = Map.empty,
      returnDescription: String = "") {
    def isEmpty: Boolean = description.isEmpty && params.isEmpty && returnDescription.isEmpty
  }

  // leading /** ... */ only — anything before the opener except whitespace
  // means the text is not a documented expression
  private val Lead = """(?s)\s*/\*\*(.*?)\*/(.*)""".r

  /** Scaladoc continuation cleanup: strip a leading `*` per line when EVERY
   * continuation line has one (otherwise it's markdown, leave it alone). */
  private def clean(body: String): String = {
    val lines = body.split("\n", -1)
    if (lines.length <= 1) body
    else if (lines.tail.forall(l => l.trim.isEmpty || l.matches("""^\s*\*.*""")))
      (lines.head +: lines.tail.map(_.replaceAll("""^\s*\*""", ""))).mkString("\n")
    else body
  }

  private val Mark = """@param\s+(\w+)|@return""".r

  private def parseBody(raw: String): Docs = {
    val b = clean(raw)
    val marks = Mark.findAllMatchIn(b).toList
    val description = marks.headOption.map(m => b.substring(0, m.start)).getOrElse(b).trim
    val sections = marks.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < marks.length) marks(i + 1).start else b.length
      (Option(m.group(1)), b.substring(m.end, end).trim)
    }
    Docs(
      description,
      sections.collect { case (Some(name), text) => name -> text }.toMap,
      sections.collectFirst { case (None, text) => text }.getOrElse(""))
  }

  /** Some(docs) when the text begins with a doc comment. */
  def parse(sql: String): Option[Docs] = sql match {
    case Lead(body, _) => Some(parseBody(body))
    case _ => None
  }

  /** The SQL with any leading doc comment removed. */
  def stripComments(sql: String): String = sql match {
    case Lead(_, rest) => rest.trim
    case _ => sql
  }
}
