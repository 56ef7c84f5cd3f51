package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Source-level scale-hygiene audit — the checks a reviewer otherwise
  * re-does by hand every round, made un-forgettable:
  *
  *  - no Scala `udf()` (codegen'd builtins / native Catalyst expressions
  *    only — a Scala UDF is an interpreted black box Catalyst can
  *    neither push through nor codegen);
  *  - no `???` stubs in shipped code;
  *  - every driver-side action (`collect`/`head`/`collectAsList`/
  *    `toLocalIterator`) carries a `// bounded: <why>` marker on the
  *    same or one of the two preceding lines — the documented reason
  *    the materialized result cannot scale with the corpus (1-row
  *    aggregates, ≤cap samples, #source/#list frames, limit-k
  *    argmaxes). A new unbounded collect cannot land without either
  *    the marker (visible in review, greppable) or failing here.
  */
class SourceAuditSpec extends AnyFunSuite {

  private def sources: Seq[(String, Vector[String])] = {
    val root = Paths.get("src/main/scala/graft")
    assert(Files.isDirectory(root), s"main source root not found at $root")
    val walk = Files.walk(root)
    try walk.iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map((p: Path) => (p.toString, Files.readAllLines(p).asScala.toVector))
      .toVector
    finally walk.close()
  }

  /** Per-line comment-only flags with POSITIONAL block-comment tracking:
    * a line is comment-only iff no non-whitespace character appears
    * outside comment spans. The trim-prefix heuristic this replaces had
    * two holes: code followed by a trailing block-comment OPEN left
    * `inBlock` false (subsequent star-prefixed lines audited as code →
    * spurious failures), and code after a block-comment CLOSE on the
    * closing line was flagged as comment (escaping the udf()/bounded
    * audits). Double-quoted string contents are skipped so a literal
    * containing comment markers (URLs, SQL) cannot open a phantom block.
    */
  private def commentFlags(lines: Vector[String]): Vector[Boolean] = {
    var inBlock = false
    lines.map { line =>
      var i = 0
      var code = false
      val n = line.length
      var lineDone = false
      while (i < n && !lineDone) {
        if (inBlock) {
          val close = line.indexOf("*/", i)
          if (close >= 0) { inBlock = false; i = close + 2 } else i = n
        } else {
          val c = line.charAt(i)
          if (c == '/' && i + 1 < n && line.charAt(i + 1) == '*') {
            inBlock = true; i += 2
          } else if (c == '/' && i + 1 < n && line.charAt(i + 1) == '/') {
            lineDone = true // line comment: rest of line is comment
          } else if (c == '"') {
            code = true; i += 1
            while (i < n && line.charAt(i) != '"') {
              if (line.charAt(i) == '\\' && i + 1 < n) i += 2 else i += 1
            }
            i += 1
          } else {
            if (!c.isWhitespace) code = true
            i += 1
          }
        }
      }
      !code
    }
  }

  test("no Scala udf() in main source") {
    val hits = for {
      (f, lines) <- sources
      flags = commentFlags(lines)
      (l, i) <- lines.zipWithIndex
      if !flags(i) && l.matches(""".*(^|[^\w.])udf\s*\(.*""")
    } yield s"$f:${i + 1}"
    assert(hits.isEmpty, s"udf() in main source: ${hits.mkString(", ")}")
  }

  test("no ??? stubs in main source") {
    val hits = for {
      (f, lines) <- sources
      flags = commentFlags(lines)
      (l, i) <- lines.zipWithIndex
      if !flags(i) && l.contains("???")
    } yield s"$f:${i + 1}"
    assert(hits.isEmpty, s"??? stub in main source: ${hits.mkString(", ")}")
  }

  test("every driver-side action carries a '// bounded:' justification") {
    val action = """.*(\.collect\(\)|\.head\(\)|\.collectAsList\(|\.toLocalIterator).*""".r
    // Marker must be tied to the statement: on the action line itself, or
    // on comment-ONLY lines immediately above it (a contiguous comment run
    // touching the action line). A marker two lines up with unrelated code
    // in between no longer sanctions the action.
    def marked(lines: Vector[String], flags: Vector[Boolean], i: Int): Boolean = {
      if (lines(i).contains("// bounded:")) true
      else {
        var j = i - 1
        var found = false
        while (j >= 0 && flags(j) && !found) {
          if (lines(j).contains("bounded:")) found = true
          j -= 1
        }
        found
      }
    }
    val unmarked = for {
      (f, lines) <- sources
      flags = commentFlags(lines)
      (l, i) <- lines.zipWithIndex
      if !flags(i) && action.matches(l)
      if !marked(lines, flags, i)
    } yield s"$f:${i + 1}: ${l.trim.take(80)}"
    assert(unmarked.isEmpty,
      "driver-side action without a '// bounded:' justification:\n" +
        unmarked.mkString("\n"))
  }

  /** Rot detector for '// bounded:' justifications: a marker that NAMES a
    * variable (camelCase or underscored token, e.g. "≤ sampleCap rows")
    * is only evidence while that variable still exists at the call site —
    * a rename or code move leaves the comment describing nothing. Flag
    * markers whose every named variable is absent from the surrounding
    * ±5 lines (comment-only lines and the justification text itself
    * excluded — a bound restated in prose must not self-certify). Markers
    * that name no variable ("1-row argmax", "#lists centroid rows") pass
    * vacuously: they state shape, not a binding, and cannot rot this way.
    * Same philosophy as PlansSpec's whitelist-must-match rule. */
  private def rottedBoundedMarkers(lines: Vector[String],
                                   flags: Vector[Boolean]): Seq[(Int, String)] = {
    val ident = """[A-Za-z][A-Za-z0-9_]*""".r
    def namedVars(just: String): Seq[String] =
      ident.findAllIn(just).toSeq.filter(t =>
        t.contains("_") || t.matches("""[a-z]+[A-Z][A-Za-z0-9]*"""))
    for {
      (l, i) <- lines.zipWithIndex.toSeq
      mIdx = l.indexOf("bounded:")
      if mIdx >= 0 && (l.contains("// bounded:") || flags(i))
      vars = namedVars(l.substring(mIdx + "bounded:".length))
      if vars.nonEmpty
      window = (math.max(0, i - 5) to math.min(lines.length - 1, i + 5))
        .map(j =>
          if (j == i) l.substring(0, mIdx)
          else if (flags(j)) "" // a variable named only in comments can rot too
          else lines(j))
        .mkString("\n")
      if !vars.exists(v =>
        ("""(?s).*\b""" + java.util.regex.Pattern.quote(v) + """\b.*""").r.matches(window))
    } yield (i + 1, vars.mkString(","))
  }

  test("'// bounded:' justifications naming a variable must still bind within 5 lines") {
    val rotted = for {
      (f, lines) <- sources
      flags = commentFlags(lines)
      (line, vars) <- rottedBoundedMarkers(lines, flags)
    } yield s"$f:$line (names: $vars)"
    assert(rotted.isEmpty,
      "rotted '// bounded:' marker — named variable absent from the " +
        "surrounding 5 lines:\n" + rotted.mkString("\n"))
  }

  test("the bounded-marker rot detector flags a deliberately rotted marker") {
    // healthy: the named bound appears on the action line itself
    val healthy = Vector(
      "  val pts = vectors.limit(sampleCap)",
      "    .collect() // bounded: ≤ sampleCap rows")
    assert(rottedBoundedMarkers(healthy, commentFlags(healthy)).isEmpty)
    // rotted: the justification names fooCap, which exists nowhere nearby
    // (the variable was renamed but the comment kept the old name)
    val rotted = Vector(
      "  val pts = vectors.limit(barMax)",
      "    .collect() // bounded: ≤ fooCap rows")
    assert(rottedBoundedMarkers(rotted, commentFlags(rotted)).map(_._1) == Seq(2))
    // vacuous: no named variable — shape-only justifications never rot
    val shapeOnly = Vector("  df.agg(max(col(\"x\"))).head() // bounded: 1-row agg")
    assert(rottedBoundedMarkers(shapeOnly, commentFlags(shapeOnly)).isEmpty)
  }
}
