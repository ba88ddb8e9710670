package graft

import org.scalatest.funsuite.AnyFunSuite

/** docs/sqlfunctions.md stays complete and fresh BY BUILD (VERDICT r16
 * #8): the generated index must match what DocsGen renders today, and
 * every registered function must appear in the curated tables above the
 * generated block — adding a Registry function without documenting it
 * fails here, not in review. */
class DocsParitySpec extends AnyFunSuite {

  private lazy val page =
    java.nio.file.Files.readString(java.nio.file.Paths.get("docs/sqlfunctions.md"))

  test("generated index is current: DocsGen would not change the page") {
    assert(page.contains(DocsGen.Begin),
      "docs/sqlfunctions.md has no generated index — run: sbt \"runMain graft.DocsGen\"")
    assert(DocsGen.render(page) == page,
      "docs/sqlfunctions.md index is stale — run: sbt \"runMain graft.DocsGen\"")
  }

  test("every registered function is documented in the curated tables") {
    val curated = page.substring(0, page.indexOf(DocsGen.Begin))
    // a function counts as documented when its snake_case name appears as
    // a WHOLE token inside a backtick span (tables or prose) of the
    // curated half of the page — set membership, not substring contains,
    // so `token_count` can never vouch for an undocumented `count`;
    // `name[_suffix]` shorthand documents both variants
    val raw = "`[^`]+`".r.findAllIn(curated).mkString(" ").toLowerCase
    val expanded = "([a-z0-9_]+)\\[_([a-z0-9_]+)\\]".r
      .replaceAllIn(raw, m => s"${m.group(1)} ${m.group(1)}_${m.group(2)}")
    val tokens: Set[String] = expanded.split("[^a-z0-9_]+").filter(_.nonEmpty).toSet
    val missing = graft.functions.Registry.registeredNames
      .filterNot(n => tokens.contains(n.toLowerCase))
    assert(missing.isEmpty,
      s"registered but undocumented in docs/sqlfunctions.md: " +
        missing.mkString(", ") + " — add a curated row, then rerun DocsGen")
  }
}
