package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Source-level gate for the engine's rounding convention: every
  * oracle-facing `round(...)` must be [[graft.functions.c_round]]
  * (DuckDB-exact, always DoubleType), imported under the name `round`
  * via `import graft.functions.{c_round => round}`. The convention is
  * shadowing-based, so two silent failure modes exist that no compile
  * error catches:
  *   - a NEW query/operator file uses `round()` without the import →
  *     Spark's HALF_UP shortest-decimal round → representational ties
  *     flip oracle hashes (the rounds-4/5 q143/q123 red cells);
  *   - someone "cleans up" the import in an existing file → same drift.
  * This spec turns both into a test failure at the file that regressed.
  */
class RoundLintSpec extends AnyFunSuite {

  private val dirs = Seq(
    "src/main/scala/graft/queries",
    "src/main/scala/graft/operators",
    "src/main/scala/graft/streaming",
    "src/main/scala/graft/plans")

  // a call site: `round(` not preceded by an identifier character or
  // dot (excludes c_round(, bround(, .round(, unround( etc.)
  private val callSite = java.util.regex.Pattern.compile("(?<![\\w.])round\\(")
  private val shadowImport = "import graft.functions.{c_round => round}"

  test("every file calling round() carries the c_round shadow import") {
    val offenders = for {
      dir <- dirs
      p = java.nio.file.Paths.get(dir)
      if java.nio.file.Files.isDirectory(p)
      f <- {
        val s = java.nio.file.Files.list(p)
        try s.iterator().asScala.toList.filter(_.toString.endsWith(".scala"))
        finally s.close()
      }
      src = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      // strip block + line comments so prose mentioning round() doesn't
      // count (Scaladoc was the first false positive this gate caught)
      code = src.replaceAll("(?s)/\\*.*?\\*/", "")
        .linesIterator.map(l =>
          l.indexOf("//") match { case -1 => l; case i => l.take(i) })
        .mkString("\n")
      if callSite.matcher(code).find() && !code.contains(shadowImport)
    } yield f.toString
    assert(offenders.isEmpty,
      s"files call round() without `$shadowImport`: ${offenders.mkString(", ")}")
  }
}
