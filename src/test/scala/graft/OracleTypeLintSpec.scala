package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lint over every `SparkEntry.oracleSql` entry: the driver's
  * hash gate is sensitive to the ORACLE's output value types, not just
  * values (round-1: DECIMAL vs DOUBLE; round-13..15: `q_attribution`
  * red for three rounds because DuckDB's bare `SUM(BIGINT)` returns
  * HUGEINT while the Spark twin emits LONG — values identical, hash
  * mismatched). DuckDB is driver-side only, so this spec enforces the
  * repo idiom statically on the final top-level SELECT list of each
  * oracle:
  *
  *  - `HUGEINT` must not appear in the final select list at all;
  *  - every `SUM(` there must be wrapped in an enclosing
  *    `CAST(... AS BIGINT|DOUBLE)` (DuckDB: SUM over any integer type
  *    returns HUGEINT; SUM over DECIMAL returns DECIMAL), OR sit in a
  *    float-promoting context OUTSIDE its own parentheses — a double
  *    literal (`100.0`, `1e4`) or a `/` division (DuckDB `/` is float
  *    division), either of which collapses HUGEINT/DECIMAL to DOUBLE.
  *    "Outside its own parens" matters: the r13 bug had `0.5` INSIDE
  *    the sum's argument and nothing promoting outside;
  *  - a final select item whose outermost expression is a `CAST` must
  *    not target DECIMAL or HUGEINT.
  *
  * Best-effort by construction (checks the last depth-0 SELECT, so a
  * depth-0 UNION's earlier branch is unchecked), but it has zero false
  * positives on the full 158-oracle corpus and catches the exact bug
  * class that cost three rounds. The dynamic complement — running all
  * oracles through DuckDB and asserting no HUGEINT/DECIMAL result
  * columns — was run at r16 (all clean) and is reproducible driver-side.
  */
class OracleTypeLintSpec extends AnyFunSuite {

  /** Blank out single-quoted string literals and `--` comments (keeps
    * offsets stable so reported positions match the source). */
  private def blankNoise(s: String): String = {
    val out = s.toCharArray
    var i = 0
    while (i < out.length) {
      if (out(i) == '\'') {
        i += 1
        while (i < out.length && out(i) != '\'') { out(i) = ' '; i += 1 }
        i += 1
      } else if (out(i) == '-' && i + 1 < out.length && out(i + 1) == '-') {
        while (i < out.length && out(i) != '\n') { out(i) = ' '; i += 1 }
      } else i += 1
    }
    new String(out)
  }

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Positions where `kw` occurs as a whole word at paren depth 0. */
  private def depth0Keyword(low: String, kw: String): Seq[Int] = {
    val hits = Seq.newBuilder[Int]
    var depth = 0
    var i = 0
    while (i < low.length) {
      low(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && low.startsWith(kw, i) &&
              (i == 0 || !isWordChar(low(i - 1))) &&
              (i + kw.length >= low.length || !isWordChar(low(i + kw.length))))
            hits += i
      }
      i += 1
    }
    hits.result()
  }

  /** The select list of the LAST top-level SELECT (the statement whose
    * schema the driver hashes): text between that SELECT and its
    * depth-0 FROM (or end of string for FROM-less selects). */
  private def finalSelectList(sqlLow: String): String = {
    val sel = depth0Keyword(sqlLow, "select").lastOption
      .getOrElse(fail("oracle has no top-level SELECT"))
    val rest = sqlLow.substring(sel + "select".length)
    val from = depth0Keyword(rest, "from").headOption.getOrElse(rest.length)
    rest.substring(0, from)
  }

  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      if (s(i) == '(') depth += 1
      else if (s(i) == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val parts = Seq.newBuilder[String]
    var depth = 0; var start = 0; var i = 0
    while (i < s.length) {
      s(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => parts += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    parts += s.substring(start)
    parts.result()
  }

  private val castTarget = """^\s*cast\s*\(""".r
  private val doubleLit = """\d\s*\.\s*\d|\d\s*e\s*[+-]?\d""".r

  /** All `cast(` opens in `item` whose parens enclose [from, to]. */
  private def enclosingCastTargets(item: String, from: Int, to: Int): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = item.indexOf("cast", 0)
    while (i >= 0) {
      if ((i == 0 || !isWordChar(item(i - 1)))) {
        val open = item.indexOf('(', i + 4)
        if (open >= 0 && item.substring(i + 4, open).trim.isEmpty) {
          val close = matchParen(item, open)
          if (close > 0 && open < from && close > to) {
            // target type = word after the LAST depth-1 ` as ` before close
            val inner = item.substring(open + 1, close)
            val asPos = depth0Keyword(inner, "as").lastOption
            asPos.foreach { p =>
              out += inner.substring(p + 2).trim.takeWhile(c => isWordChar(c))
            }
          }
        }
      }
      i = item.indexOf("cast", i + 1)
    }
    out.result()
  }

  private def lint(entries: Seq[(String, String)]): Seq[String] = {
    val violations = Seq.newBuilder[String]
    for ((name, sql) <- entries) {
      val list = finalSelectList(blankNoise(sql).toLowerCase)
      if (list.contains("hugeint"))
        violations += s"$name: HUGEINT in final select list"
      for (item <- splitTopLevel(list)) {
        // outermost-cast target must not be decimal/hugeint
        castTarget.findFirstMatchIn(item).foreach { m =>
          val open = item.indexOf('(', m.start)
          val close = matchParen(item, open)
          // "outermost" = the cast's close paren is the last paren and
          // only an alias may follow
          val tail = if (close > 0) item.substring(close + 1).trim else "x"
          if (close > 0 && (tail.isEmpty || tail.startsWith("as "))) {
            val inner = item.substring(open + 1, close)
            depth0Keyword(inner, "as").lastOption.foreach { p =>
              val tgt = inner.substring(p + 2).trim.takeWhile(isWordChar)
              if (tgt == "decimal" || tgt == "hugeint")
                violations += s"$name: final item casts to $tgt: ${item.trim.take(80)}"
            }
          }
        }
        // every SUM must be cast-wrapped or float-promoted outside itself
        var i = item.indexOf("sum")
        while (i >= 0) {
          val wholeWord = (i == 0 || !isWordChar(item(i - 1)))
          val open = item.indexOf('(', i + 3)
          val isCall = wholeWord && open >= 0 &&
            item.substring(i + 3, open).trim.isEmpty
          if (isCall) {
            val close = matchParen(item, open)
            val end = if (close > 0) close else item.length - 1
            val casts = enclosingCastTargets(item, i, end)
            val safeCast = casts.exists(t => t == "bigint" || t == "double")
            // promotion context OUTSIDE the sum's own parens
            val outside = item.substring(0, i) +
              (" " * (end + 1 - i)) + item.substring(end + 1)
            val promoted = doubleLit.findFirstIn(outside).isDefined ||
              outside.contains("/")
            if (!safeCast && !promoted)
              violations += s"$name: bare SUM in final select (DuckDB would emit HUGEINT/DECIMAL): ${item.trim.take(100)}"
          }
          i = item.indexOf("sum", i + 3)
        }
      }
    }
    violations.result()
  }

  test("no oracle's final select can emit HUGEINT or DECIMAL") {
    val v = lint(SparkEntry.oracleSql.toSeq.sortBy(_._1))
    assert(v.isEmpty, "\n" + v.mkString("\n"))
  }

  test("the lint catches the exact r13 q_attribution bug shape") {
    // the SQL that sat red for three rounds: bare SUM over a BIGINT
    // cast — 0.5 INSIDE the sum's parens must not count as promotion
    val r13 = """WITH att AS (SELECT 'click' AS channel, 1.0 AS value)
      |SELECT channel, count(*) AS n_purchases,
      |  SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS attributed_cents
      |FROM att GROUP BY 1""".stripMargin
    assert(lint(Seq("r13_bug" -> r13)).exists(_.contains("bare SUM")))
    // and the r16 fix passes
    val r16 = r13.replace(
      "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS attributed_cents",
      "CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS attributed_cents")
    assert(lint(Seq("r16_fix" -> r16)).isEmpty)
    // tier-B: HUGEINT anywhere in the final list is flagged
    assert(lint(Seq("h" -> "SELECT CAST(x AS HUGEINT) AS y FROM t"))
      .exists(_.contains("HUGEINT")))
    // outermost DECIMAL cast is flagged
    assert(lint(Seq("d" -> "SELECT CAST(x AS DECIMAL(18,2)) AS y FROM t"))
      .exists(_.contains("casts to decimal")))
  }
}
