package graft

import java.util.regex.Pattern

import org.scalatest.funsuite.AnyFunSuite

/** RE2 ∩ Java regex dialect lint (round-14 verdict ask #4).
  *
  * Every oracle-replayed regex (redact, normalizeUrl, normalizeText,
  * stripHtml, fixEncoding, extractUrls, urlHost, the tokenizer and
  * language-ID classes, …) must stay inside the dialect BOTH engines
  * share: Spark compiles `java.util.regex`, DuckDB compiles RE2.
  * Until now that discipline was enforced by convention plus per-key
  * oracle greenness — a future edit could introduce a Java-only
  * construct (lookahead, backreference, possessive quantifier) that
  * happens to pass at one SF and detonate in DuckDB later, or
  * silently change semantics (`\Z`, `\G`, char-class intersection).
  *
  * This spec closes that hole statically: it scans EVERY
  * double-quoted string literal in the regex-bearing main sources
  * (the same files `grep -l regexp_|rlike` returns — the list is
  * pinned below and tripwired), unescapes it the way scalac does,
  * and asserts none contains an RE2-incompatible construct. Scanning
  * all literals (not just the ones syntactically adjacent to a
  * regexp_* call) is deliberate: it is over-approximate but cannot
  * miss a regex stored in a val, built by concat, or passed through
  * a helper — and prose strings trivially satisfy the lint.
  *
  * Compilability on the Java side is asserted for the NAMED pattern
  * vals the operators ship (urlRe/emailRe/ipRe/phoneRe), which are
  * also checked to still exist — the enumeration the verdict asked
  * for.
  */
class RegexDialectSpec extends AnyFunSuite {

  /** Java-only / non-RE2 constructs. Each entry: (detector, label).
    * Detection is on the UNESCAPED pattern text (real backslashes).
    */
  private val re2Violations: Seq[(String => Boolean, String)] = Seq(
    ((s: String) => s.contains("(?=")) -> "lookahead (?=",
    ((s: String) => s.contains("(?!")) -> "negative lookahead (?!",
    ((s: String) => s.contains("(?<=")) -> "lookbehind (?<=",
    ((s: String) => s.contains("(?<!")) -> "negative lookbehind (?<!",
    ((s: String) => s.contains("(?>")) -> "atomic group (?>",
    ((s: String) => s.contains("\\G")) -> "\\G anchor",
    ((s: String) => s.contains("\\Z")) -> "\\Z anchor",
    ((s: String) => s.contains("\\R")) -> "\\R linebreak",
    ((s: String) => s.contains("\\X")) -> "\\X grapheme",
    ((s: String) => s.contains("\\k<")) -> "named backreference \\k<",
    ((s: String) => s.contains("\\p{java")) -> "\\p{javaXxx} property",
    ((s: String) => s.contains("\\p{Is")) -> "\\p{IsXxx} property",
    // numeric backreference \1..\9 (Java) — RE2 has none
    ((s: String) => "\\\\[1-9]".r.findFirstIn(s).isDefined) ->
      "numeric backreference",
    // char-class intersection [a&&[b]] — the && must be inside [...]
    ((s: String) => "\\[[^\\]]*&&".r.findFirstIn(s).isDefined) ->
      "char-class intersection &&",
    // possessive quantifiers: a quantifier immediately followed by +
    // (X*+ X++ X?+ X{n}+). "]+" / ")+" are greedy-plus (fine); the
    // possessive forms are exactly these two-char sequences outside
    // a character class. "++" as prose (e.g. "C++") is caught too —
    // acceptable: no source string needs a literal "*+"/"?+" today,
    // and a false positive is a visible rename, not a silent escape.
    ((s: String) => s.contains("*+") || s.contains("?+") ||
      s.contains("++") || "\\}\\+".r.findFirstIn(s).isDefined) ->
      "possessive quantifier"
  )

  private def violations(pattern: String): Seq[String] =
    re2Violations.collect { case (hit, label) if hit(pattern) => label }

  /** Unescape a Scala/Java string literal body the way scalac does
    * (enough for the escapes these sources use).
    */
  private def unescape(body: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      val ch = body.charAt(i)
      if (ch == '\\' && i + 1 < body.length) {
        body.charAt(i + 1) match {
          case '\\' => sb.append('\\'); i += 2
          case '"' => sb.append('"'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'u' if i + 5 < body.length =>
            sb.append(Integer.parseInt(body.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append('\\').append(other); i += 2
        }
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }

  /** All string-literal bodies in a source text, via a hand-rolled
    * tokenizer (a regex scanner stack-overflows on the 7,000-line
    * SparkEntry). Triple-quoted blocks come back as one body with
    * escapes left raw (scalac does not process them there either).
    *
    * Bodies that are DuckDB ORACLE SQL (margin-pipe triple-quoted
    * blocks / SELECT text) are excluded: DuckDB compiles its own
    * regexes with RE2 directly, so a Java-only construct there fails
    * loudly at gate time — and DuckDB's regexp_replace REPLACEMENT
    * strings legitimately use `\1` where Java uses `$1`
    * (SparkEntry's q_url_dedup oracle does), which this lint must
    * not misread as a pattern backreference.
    */
  private def stringLiterals(src: String, isOracleFile: Boolean): Seq[String] = {
    // (body, wasTripleQuoted)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    var i = 0
    val n = src.length
    while (i < n) {
      if (src.startsWith("\"\"\"", i)) {
        val end = src.indexOf("\"\"\"", i + 3)
        if (end < 0) { i = n }
        else { out += ((src.substring(i + 3, end), true)); i = end + 3 }
      } else if (src.charAt(i) == '"') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (i < n && !done) {
          val ch = src.charAt(i)
          if (ch == '\\' && i + 1 < n) { sb.append(ch).append(src.charAt(i + 1)); i += 2 }
          else if (ch == '"') { done = true; i += 1 }
          else if (ch == '\n') { done = true; i += 1 } // unterminated: bail
          else { sb.append(ch); i += 1 }
        }
        out += ((sb.toString, false))
      } else i += 1
    }
    out.toSeq
      // DuckDB oracle SQL is exempt (RE2-native, and its replacement
      // strings legitimately use \1) — but ONLY in the file that
      // carries the oracle map, and only for its house shapes:
      // triple-quoted margin blocks and SELECT-leading bodies. A
      // Spark-side regex in any other file is never exempted however
      // SQL-ish its surrounding text looks (the round-15 ADVICE
      // hole: content sniffing applied everywhere).
      .filterNot { case (b, triple) =>
        isOracleFile && (triple && (
          b.contains("SELECT ") || "(?m)^\\s*\\|".r.findFirstIn(b).isDefined) ||
          b.trim.startsWith("SELECT ") || b.trim.startsWith("WITH "))
      }
      // scalac processes escapes only in single-quoted literals;
      // unescaping a triple-quoted body would manufacture escapes the
      // compiled string never contains (false-positive direction, but
      // the lint should match scalac exactly)
      .map { case (b, triple) => if (triple) b else unescape(b) }
  }

  /** The regex-bearing main sources. Tripwired below: if a regexp_*
    * call appears in a file outside this list, the spec fails and
    * the list must grow.
    */
  private val lintedFiles = Seq(
    "src/main/scala/graft/SparkEntry.scala",
    "src/main/scala/graft/functions/TextAnalysis.scala",
    "src/main/scala/graft/functions/TextFunctions.scala",
    "src/main/scala/graft/functions/HashExpressions.scala",
    "src/main/scala/graft/operators/Profile.scala",
    "src/main/scala/graft/operators/Expectations.scala"
  )

  private def read(p: String): String = {
    val f = new java.io.File(p)
    assert(f.isFile, s"linted source missing: $p")
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
  }

  test("every string literal in regex-bearing sources is RE2-compatible") {
    val scanned = for {
      path <- lintedFiles
      body <- stringLiterals(read(path),
        isOracleFile = path.endsWith("SparkEntry.scala"))
    } yield (path, body)
    // tripwire: a scanner regression that returns (almost) nothing
    // would green this lint trivially — the six files carry hundreds
    // of literals today
    assert(scanned.size > 300, s"scanner found only ${scanned.size} literals")
    val bad = for {
      (path, pattern) <- scanned
      v <- violations(pattern)
    } yield s"$path: <<$pattern>> uses $v"
    assert(bad.isEmpty,
      s"${bad.size} RE2-incompatible literals:\n" + bad.mkString("\n"))
  }

  test("the linted-file list covers every main source using regexp_*/rlike") {
    val root = new java.io.File("src/main/scala/graft")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val users = walk(root)
      .filter { f =>
        val s = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        s.contains("regexp_replace") || s.contains("regexp_extract") ||
        s.contains("regexp_count") || s.contains("rlike")
      }
      .map(_.getPath.replace(java.io.File.separatorChar, '/'))
      .toSet
    assert(users.subsetOf(lintedFiles.toSet),
      s"regex-bearing files missing from the lint list: " +
        (users -- lintedFiles.toSet).mkString(", "))
  }

  test("the named replayable patterns exist, Java-compile, and lint clean") {
    import graft.functions.TextAnalysis
    val named = Map(
      "urlRe" -> TextAnalysis.urlRe,
      "emailRe" -> TextAnalysis.emailRe,
      "ipRe" -> TextAnalysis.ipRe,
      "phoneRe" -> TextAnalysis.phoneRe)
    named.foreach { case (name, re) =>
      Pattern.compile(re) // throws on a Java-invalid pattern
      assert(violations(re).isEmpty,
        s"$name is RE2-incompatible: ${violations(re).mkString(", ")}")
    }
  }

  test("the lint itself detects every violation class") {
    assert(violations("a(?=b)").nonEmpty)
    assert(violations("(a)\\1").nonEmpty)
    assert(violations("[a-z&&[^b]]").nonEmpty)
    assert(violations("a*+b").nonEmpty)
    assert(violations("\\p{javaLowerCase}").nonEmpty)
    assert(violations("x\\Z").nonEmpty)
    // and passes the shared dialect
    assert(violations("https?://[^\\s]+").isEmpty)
    assert(violations("[\\x{3040}-\\x{30ff}]").isEmpty)
    assert(violations("(?i)^(https?://[^/?#]+)").isEmpty)
    assert(violations("[^\\p{L}\\p{N}]+").isEmpty)
  }
}
