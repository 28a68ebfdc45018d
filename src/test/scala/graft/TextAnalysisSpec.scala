package graft

import graft.functions.TextAnalysis
import graft.functions.TextAnalysis._
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount: whitespace tokens, blank → 0") {
    val df = Seq("one two  three", "   ", "solo").toDF("s")
    val out = df.select(tokenCount($"s").as("n")).as[Int].collect().toSeq
    assert(out == Seq(3, 0, 1))
  }

  test("tokenCountRegex: word pieces plus standalone punctuation") {
    val df = Seq("don't stop!").toDF("s")
    // don + ' + t + stop + ! = 5
    val out = df.select(tokenCountRegex($"s").as("n")).as[Int].head()
    assert(out == 5)
  }

  test("languageId: script detection and stopword voting") {
    val df = Seq(
      "the cat sat on the mat and it is fine",
      "el perro y la casa que en un dia",
      "这是一个中文句子",
      "این یک جمله فارسی است",
      "zzz qqq xxx").toDF("s")
    val out = df.select(languageId($"s").as("l")).as[String].collect().toSeq
    assert(out == Seq("en", "es", "zh", "fa", "und"))
  }

  test("languageId: widened coverage — pt/it/nl/ru voting, ja/ko scripts") {
    val df = Seq(
      // pt: "o/do/da/em/para/com" are pt-only among the lists
      "o menino foi para casa com o livro do professor em silencio",
      // it: "di/che/il/per/non" dominate
      "il gatto che dorme per ore non ha fame di niente",
      // nl: "het/een/van/dat/op/te" are nl-only
      "het huis van een man dat op de hoek staat te koop",
      // ru: Cyrillic stopwords vote (no script shortcut for Cyrillic)
      "я не знаю что он думает на самом деле как это",
      // ja: kana present (mixed kanji + kana reads as Japanese)
      "これは日本語の文です",
      // ko: Hangul syllables
      "이것은 한국어 문장입니다",
      // kanji ONLY (no kana) still reads as Chinese
      "日本東京大学").toDF("s")
    val out = df.select(languageId($"s").as("l")).as[String].collect().toSeq
    assert(out == Seq("pt", "it", "nl", "ru", "ja", "ko", "zh"))
  }

  test("blocklistSignals: token-exact occurrence counting, no substring hits") {
    val sig = blocklistSignals($"s", Seq("bad", "worse"))
    val out = Seq(
      "bad things and worse things and BAD again", // 3 hits (case-folded)
      "badge embedded notworse",                   // substrings never hit
      "clean text only",
      "").toDF("s")
      .select(sig.getField("n_blocked").as("n"), sig.getField("blocked").as("b"))
      .as[(Int, Boolean)].collect().toSeq
    assert(out == Seq((3, true), (0, false), (0, false), (0, false)))
    intercept[IllegalArgumentException] {
      blocklistSignals($"s", Seq("Upper"))
    }
    intercept[IllegalArgumentException] {
      blocklistSignals($"s", Seq("two words"))
    }
  }

  test("languageIdScored: label matches languageId, confidence is the smoothed posterior") {
    val df = Seq(
      "the cat sat on the mat and it is fine", // en: 6 hits, no other signal
      "zzz qqq xxx",                           // und: zero evidence -> 0.5/6.5
      "これは the the the the 日本語").toDF("s")  // kana overrides, en mass lowers conf
    val out = df.select(
      languageIdScored($"s").getField("lang").as("l"),
      languageIdScored($"s").getField("conf").as("c"),
      languageId($"s").as("l0")).collect()
    out.foreach(r => assert(r.getString(0) == r.getString(2),
      "scored label must equal languageId's"))
    // en: hits = the,the,and,it,is = 5; total = 6 ("is" also hits nl)
    // conf = (5 + 0.5) / (6 + 6.5) = 0.44
    assert(out(0).getString(0) == "en")
    assert(math.abs(out(0).getDouble(1) - 0.44) < 1e-9)
    // und: (0 + 0.5) / (0 + 6.5) = 0.076923
    assert(out(1).getString(0) == "und")
    assert(math.abs(out(1).getDouble(1) - 0.076923) < 1e-9)
    // ja via kana (これは = 3 kana); cjk 3 + en 4 dilute:
    // (3 + 0.5) / (10 + 6.5) ≈ 0.212 — mixed text reads low-confidence
    assert(out(2).getString(0) == "ja")
    assert(out(2).getDouble(1) < 0.5, "mixed-language text must read low-confidence")
  }

  test("stopwordHitsAll native kernel == HOF twin, per language, on adversarial inputs") {
    // occurrence counting (not distinct), multi-language words
    // ("de"/"la"/"que" are stopwords in several lists), blanks,
    // repeats, unicode, mixed junk
    val texts = Seq(
      "the the the of and to a in is it that for",
      "el la de que y en un los una por de de",
      "le la de et les des un une du que",
      "der die das und in den von zu mit ist",
      "de de de", // es+fr+de simultaneously
      "", "   ", "zzz qqq", "میان متن فارسی the و la",
      "the\tof\nand", "THE OF AND") // tokens() lowercases
    val df = texts.toDF("s")
    val toks = graft.functions.TextAnalysis.tokens($"s")
    import graft.functions.{StopwordHitsAll, TextAnalysis => TA}
    val nativeCols = StopwordHitsAll.Langs.zipWithIndex.map { case (_, i) =>
      element_at(TA.stopwordHitsAll(toks), i + 1)
    }
    val hofCols = StopwordHitsAll.Langs.map(l => TA.stopwordHitsHof(toks, l))
    val rows = df.select((nativeCols ++ hofCols).map(_.cast("int")): _*).collect()
    rows.zip(texts).foreach { case (r, t) =>
      val n = StopwordHitsAll.Langs.length
      (0 until n).foreach { i =>
        assert(r.getInt(i) == r.getInt(n + i),
          s"lang=${StopwordHitsAll.Langs(i)} text='$t': native=${r.getInt(i)} hof=${r.getInt(n + i)}")
      }
    }
  }

  test("qualityScore: in [0,1], longer clean English text scores higher") {
    val good = ("the quick brown fox jumps over the lazy dog and it is fine " * 5)
    val bad = "@@@@ #### !!!!"
    val df = Seq(good, bad).toDF("s")
    val out = df.select(qualityScore($"s").as("q")).as[Double].collect().toSeq
    assert(out.forall(q => q >= 0.0 && q <= 1.0))
    assert(out(0) > out(1))
  }

  test("fingerprint: invariant to token order, case and punctuation") {
    val df = Seq("Hello, World!", "world HELLO", "different text").toDF("s")
    val out = df.select(fingerprint($"s").as("f")).as[String].collect().toSeq
    assert(out(0) == out(1))
    assert(out(0) != out(2))
  }

  test("tfIdfTopK: rare distinguishing terms outrank corpus-universal ones") {
    val df = Seq(
      (1L, "common zebra zebra"),
      (2L, "common apple apple"),
      (3L, "common apple apple")).toDF("doc_id", "text")
    val out = tfIdfTopK(df, "text", "doc_id", k = 1)
      .select($"doc_id", $"term").as[(Long, String)].collect().toMap
    assert(out(1L) == "zebra") // tf 2/3, df=1 — beats corpus-universal "common"
    assert(out(2L) == "apple") // tf 2/3, df=2
  }

  test("rollingHash: order-sensitive, deterministic") {
    val df = Seq("abc", "abc", "acb").toDF("s")
    val out = df.select(rollingHash($"s").as("h")).as[Long].collect().toSeq
    assert(out(0) == out(1))
    assert(out(0) != out(2))
  }

  test("redact: URL/email/IP/phone classes, clean text untouched") {
    val df = Seq(
      "mail a@b.co and c.d+x@e-f.org, see https://x.y/z?a=1 or http://p.q",
      "nothing sensitive here",
      "call 555-123-4567 or +1 555 123 4567 or (415) 555.0100 today",
      "host 10.0.0.1 and 192.168.255.254, v1.2.3 stays, 1.2.3.4.5 eats the quad",
      // digit runs that must SURVIVE the conservative phone class
      "from 1995 to 2000, ids 12345678901, page 123-45, x555-123-4567").toDF("t")
    val out = df.select(redact($"t").as("r")).as[String].collect().toSeq
    assert(out(0) == "mail <EMAIL> and <EMAIL>, see <URL> or <URL>")
    assert(out(1) == "nothing sensitive here")
    assert(out(2) == "call <PHONE> or <PHONE> or <PHONE> today")
    assert(out(3) == "host <IP> and <IP>, v1.2.3 stays, <IP>.5 eats the quad")
    // "x555-..." has no word boundary before the area code: untouched
    assert(out(4) == "from 1995 to 2000, ids 12345678901, page 123-45, x555-123-4567")
  }

  test("qualityFlags: gates fire on short, symbol-heavy and long-word docs") {
    val good = (1 to 60).map(_ => "plain").mkString(" ")
    val df = Seq(
      (1L, good),
      (2L, "too short"),
      (3L, good + " ##########################################"),
      (4L, (1 to 60).map(_ => "hyperlongwordtokens").mkString(" ")))
      .toDF("id", "t")
    val out = df.select($"id",
      qualityFlags($"t", minWords = 50).getField("pass").as("p"))
      .as[(Long, Boolean)].collect().toMap
    assert(out(1L))
    assert(!out(2L)) // n_words below the floor
    assert(!out(3L)) // symbol ratio above the cap
    assert(!out(4L)) // mean word length above the band
  }

  test("dedupLines: first occurrence kept, order preserved, custom separator") {
    val df = Seq("nav\nbody one\nnav\nbody two\nnav").toDF("t")
    val out = df.select(dedupLines($"t").as("c")).as[String].head()
    assert(out == "nav\nbody one\nbody two")
    val custom = Seq("a|b|a|c").toDF("t")
      .select(dedupLines($"t", "|").as("c")).as[String].head()
    assert(custom == "a|b|c")
  }

  test("repetitionSignals: hand-computed fractions, ties to smallest gram, edge cases") {
    import graft.functions.TextAnalysis.repetitionSignals
    // doc: 3 lines, one duplicated: "ab cd" x2 + "xy"
    //   dup_line_frac = (3-2)/3; dup_line_char_frac = (12-7)/12
    //   tokens: ab cd ab cd xy → bigrams: "ab cd"(2) "cd ab"(1) "cd xy"(1)
    //   top frac = 2 * 4 / 10
    val df = Seq("ab cd\nab cd\nxy").toDF("s")
    val r = df.select(repetitionSignals($"s").as("r"))
      .select($"r.dup_line_frac", $"r.dup_line_char_frac", $"r.top_ngram_char_frac")
      .as[(Double, Double, Double)].head()
    assert(r._1 == 1.0 / 3)
    assert(r._2 == 5.0 / 12)
    assert(r._3 == 8.0 / 10)

    // tie between "b c" and "a b" (1 each... construct a real tie):
    // "b a b a": bigrams "b a"(2) "a b"(1) → top = 2*2/4 = 1.0? chars:
    // tokens b,a,b,a → total 4; "b a" count 2, gram chars 2 → 4/4
    val tie = Seq("b a b a").toDF("s")
    val t = tie.select(repetitionSignals($"s").as("r"))
      .select($"r.top_ngram_char_frac").as[Double].head()
    assert(t == 1.0)

    // true tie: "a b c a b c" → "a b"(2) "b c"(2) "c a"(1); smallest
    // gram "a b" wins (same value either way: 2*2/6)
    val tie2 = Seq("a b c a b c").toDF("s")
    val t2 = tie2.select(repetitionSignals($"s").as("r"))
      .select($"r.top_ngram_char_frac").as[Double].head()
    assert(t2 == 4.0 / 6)

    // blank / single-token docs → all zeros, no NaN/exception
    val edge = Seq("", "   ", "solo").toDF("s")
    val e = edge.select(repetitionSignals($"s").as("r"))
      .select($"r.dup_line_frac", $"r.dup_line_char_frac", $"r.top_ngram_char_frac")
      .as[(Double, Double, Double)].collect()
    assert(e.forall(x => !x._1.isNaN && !x._2.isNaN && !x._3.isNaN))
    assert(e.forall(x => x._3 == 0.0))
  }

  test("boilerplateLines + stripBoilerplate: shared footer found and removed in order") {
    val docs = Seq(
      (1L, "unique alpha\nFOOTER\nbody one"),
      (2L, "unique beta\nFOOTER\nbody two"),
      (3L, "unique gamma\nFOOTER\nbody three"),
      (4L, "no footer here\nsomething else")).toDF("id", "text")
    val boiler = boilerplateLines(docs, "text", "id", minDocs = 3)
    val found = boiler.select($"line", $"n_docs").as[(String, Long)].collect().toMap
    assert(found == Map("FOOTER" -> 3L))

    val withExtra = docs.withColumn("lang", lit("en"))
    val out = stripBoilerplate(withExtra, boiler, "text", "id")
    // non-text columns survive, textCol replaced in place
    assert(out.columns.toSet == Set("id", "text", "lang"))
    val cleaned = out.select($"id", $"text").as[(Long, String)].collect().toMap
    assert(cleaned(1L) == "unique alpha\nbody one") // order preserved
    assert(cleaned(4L) == "no footer here\nsomething else") // untouched
    // all-boilerplate doc survives as an empty string, never dropped
    val allBoiler = Seq((9L, "FOOTER")).toDF("id", "text").unionByName(docs)
    val stripped9 = stripBoilerplate(allBoiler, boiler, "text", "id")
      .where($"id" === 9L).select($"text").as[String].collect()
    assert(stripped9.toSeq == Seq(""))
    // a line repeated WITHIN one doc counts once (array_distinct)
    val within = Seq(
      (1L, "x\nx\nx"), (2L, "y"), (3L, "z")).toDF("id", "text")
    assert(boilerplateLines(within, "text", "id", minDocs = 2).count() == 0)
  }

  test("stripBoilerplate: poisoned __pos/__line/__cleaned user columns survive intact") {
    val docs = Seq(
      (1L, "unique alpha\nFOOTER\nbody one", 10L, "a", "b"),
      (2L, "unique beta\nFOOTER\nbody two", 20L, "c", "d"),
      (3L, "unique gamma\nFOOTER\nbody three", 30L, "e", "f"))
      .toDF("id", "text", "__pos", "__line", "__cleaned")
    val boiler = boilerplateLines(docs, "text", "id", minDocs = 3)
    val out = stripBoilerplate(docs, boiler, "text", "id")
    assert(out.columns.toSet == Set("id", "text", "__pos", "__line", "__cleaned"))
    val rows = out.select($"id", $"text", $"__pos", $"__line", $"__cleaned")
      .as[(Long, String, Long, String, String)].collect().sortBy(_._1)
    assert(rows(0) == ((1L, "unique alpha\nbody one", 10L, "a", "b")))
    assert(rows(1) == ((2L, "unique beta\nbody two", 20L, "c", "d")))
    assert(rows(2) == ((3L, "unique gamma\nbody three", 30L, "e", "f")))
  }

  test("chunkTokens: stride coverage, overlap, short tails, tiny docs") {
    val df = Seq("t1 t2 t3 t4 t5 t6 t7 t8 t9 t10").toDF("s")
    // maxTokens=4, overlap=1 → stride 3 → starts 0,3,6 → 3 chunks
    val chunks = df.select(chunkTokens($"s", 4, 1).as("c"))
      .select($"c").head().getSeq[String](0)
    assert(chunks == Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    // every token covered; consecutive chunks share `overlap` tokens
    assert(chunks.flatMap(_.split(" ")).toSet == (1 to 10).map("t" + _).toSet)

    // doc shorter than maxTokens → one chunk, intact
    val short = Seq("a b").toDF("s")
      .select(chunkTokens($"s", 5).as("c")).head().getSeq[String](0)
    assert(short == Seq("a b"))
    // no overlap: exact partition
    val part = Seq("a b c d e").toDF("s")
      .select(chunkTokens($"s", 2).as("c")).head().getSeq[String](0)
    assert(part == Seq("a b", "c d", "e"))
  }

  test("contaminationHits: shared 13-grams flagged, clean docs absent") {
    val gram13 = (1 to 13).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"prefix words $gram13 suffix tail"), // contains the benchmark gram
      (2L, "totally unrelated words that never overlap with anything here at all truly"))
      .toDF("id", "text")
    val bench = Seq(gram13).toDF("gram")
    val hits = contaminationHits(docs, bench, "text", "id", 13)
      .as[(Long, Long)].collect().toMap
    assert(hits.contains(1L) && hits(1L) >= 1L)
    assert(!hits.contains(2L))
  }

  test("decontaminate: flagged docs dropped, clean docs kept, maxHits respected") {
    val gram13 = (1 to 13).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"prefix words $gram13 suffix tail"),
      (2L, "totally unrelated words that never overlap with anything here at all truly"),
      (3L, s"another copy here $gram13 trailing words end"))
      .toDF("id", "text")
    val bench = Seq(gram13).toDF("gram")
    val kept = decontaminate(docs, bench, "text", "id", 13)
      .select($"id").as[Long].collect().toSet
    assert(kept == Set(2L))
    // a hit threshold above any doc's count keeps everything
    val all = decontaminate(docs, bench, "text", "id", 13, maxHits = 99)
      .select($"id").as[Long].collect().toSet
    assert(all == Set(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      decontaminate(docs, bench, "text", "id", 13, maxHits = 0)
    }
  }

  test("extractUrls: multi-match in order, empty array when none, null-safe") {
    val df = Seq(
      (1L, "see https://a.io/x?q=1 and http://b.co/y then done"),
      (2L, "no links at all here"),
      (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = df.select($"id", extractUrls($"text").as("u"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("https://a.io/x?q=1", "http://b.co/y"))
    assert(out(2L) == Seq.empty)
    assert(out(3L) == Seq.empty)
  }

  test("normalizeUrl: fragment, tracking params, case, trailing slash") {
    val cases = Seq(
      // tracking param first: '?' repaired onto the surviving param
      "https://a.com/p?utm_source=x&id=3" -> "https://a.com/p?id=3",
      // tracking param in the middle
      "https://a.com/p?id=3&utm_campaign=y&z=1" -> "https://a.com/p?id=3&z=1",
      // only tracking params: query gone entirely
      "https://a.com/p?utm_source=x&fbclid=abc" -> "https://a.com/p",
      // fragment dropped, scheme+host lowercased, path case KEPT
      "HTTPS://Ex.COM/PaTh#frag" -> "https://ex.com/PaTh",
      // trailing slash trimmed (host-only and path forms)
      "http://a.com/" -> "http://a.com",
      "http://a.com/p/" -> "http://a.com/p",
      // non-URL text passes through
      "not a url" -> "not a url")
    val out = cases.map(_._1).toDF("u")
      .select(graft.functions.TextAnalysis.normalizeUrl($"u")).as[String].collect().toSeq
    out.zip(cases).foreach { case (got, (in, want)) =>
      assert(got == want, s"normalizeUrl($in)")
    }
  }

  test("normalizeText: case/digit/punct folds, idempotent, nulls pass through") {
    val inputs = Seq(
      "Hello,  World! 123",
      "hello world 000",          // same fold as above
      "  spaced\t\nout  ",
      "déjà-vu: Déjà  vu 9",
      "",
      null)
    val out = inputs.toDF("t")
      .select(graft.functions.TextAnalysis.normalizeText($"t")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(out(0) == "hello world 000")
    assert(out(0) == out(1))
    assert(out(2) == "spaced out")
    assert(out(3) == "déjà vu déjà vu 0")
    assert(out(4) == "")
    assert(out(5) == null)
    // idempotent: a second pass is the identity
    val again = out.filter(_ != null).toDF("t")
      .select(graft.functions.TextAnalysis.normalizeText($"t"))
      .as[String].collect().toSeq
    assert(again == out.filter(_ != null).toSeq)
  }

  test("stripHtml: blocks dropped, tags stripped, entities decoded, ws collapsed") {
    val inputs = Seq(
      "<html><head><title>T</title><style>p { color: red; }</style>" +
        "<script type=\"text/javascript\">if (1 < 2 && 3 > 2) { x(); }</script>" +
        "</head><body><h1>Head</h1><!-- note --><p>one</p><p>two</p></body></html>",
      "a &lt;b&gt; &quot;c&quot; &apos;d&apos; &#39;e&#39; &amp;amp; f&nbsp;g",
      "plain text with math: x < 3 and y > 4",   // bare < > survive
      "<p>unclosed <script>tag only",            // no closer: tags stripped
      "<br/><BR><img src=\"x.png\" alt=\"A > B\">after",
      "",
      null)
    val out = inputs.toDF("t")
      .select(graft.functions.TextAnalysis.stripHtml($"t")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(out(0) == "T Head one two")
    // &amp;amp; → "&amp;" literal (single decode pass, & last)
    assert(out(1) == "a <b> \"c\" 'd' 'e' &amp; f g")
    assert(out(2) == "plain text with math: x < 3 and y > 4")
    assert(out(3) == "unclosed tag only")
    // attribute value contains '>': the tag match stops there — the
    // documented plain-regex tradeoff ("A " survives as text)
    assert(out(4) == "B\">after" || out(4) == "after",
      s"img-with-gt-attr: got '${out(4)}'")
    assert(out(5) == "")
    assert(out(6) == null)
  }

  test("entropySignals: histogram entropy + printable ratio") {
    val inputs = Seq(
      "aaaaaaaa",           // single symbol: entropy 0
      "abababab",           // two equiprobable symbols: entropy 1
      "abcdabcd",           // four equiprobable: entropy 2
      "The quick brown fox jumps over the lazy dog.",
      "ctl\u0001\u0002chars",
      "",
      null)
    val out = inputs.toDF("t")
      .select(graft.functions.TextAnalysis.entropySignals($"t").as("e"))
      .select($"e.char_entropy", $"e.printable_ratio").collect()
    assert(out(0).getDouble(0) == 0.0 && out(0).getDouble(1) == 1.0)
    assert(out(1).getDouble(0) == 1.0)
    assert(out(2).getDouble(0) == 2.0)
    // real prose sits in the 3.5-5 band
    assert(out(3).getDouble(0) > 3.5 && out(3).getDouble(0) < 5.0)
    // 2 control chars out of 10
    assert(out(4).getDouble(1) == 0.8)
    assert(out(5).getDouble(0) == 0.0 && out(5).getDouble(1) == 1.0)
    assert(out(6).isNullAt(0) && out(6).isNullAt(1))
    // surrogate-pair sanity: an astral-plane char is ONE symbol
    val astral = Seq("😀😀").toDF("t")
      .select(graft.functions.TextAnalysis.entropySignals($"t")("char_entropy"))
      .head().getDouble(0)
    assert(astral == 0.0, s"astral: $astral")
  }

  test("piiCounts: per-class counts follow the redact ladder") {
    val inputs = Seq(
      // email INSIDE a URL attributes to the URL class only
      "see https://ex.org/u?mail=a@b.co for a@b.co and 10.0.0.1",
      "call +1 555-123-4567 or (415) 555.0100",
      "nothing personal here, 1995 to 2000",
      null)
    val out = inputs.toDF("t")
      .select(piiCounts($"t").as("p"))
      .select($"p.n_url", $"p.n_email", $"p.n_ip", $"p.n_phone", $"p.has_pii")
      .collect()
    assert(out(0).getLong(0) == 1 && out(0).getLong(1) == 1 &&
      out(0).getLong(2) == 1 && out(0).getLong(3) == 0 && out(0).getBoolean(4))
    assert(out(1).getLong(3) == 2 && out(1).getLong(0) == 0 && out(1).getBoolean(4))
    assert(out(2).getLong(0) == 0 && out(2).getLong(1) == 0 &&
      out(2).getLong(2) == 0 && out(2).getLong(3) == 0 && !out(2).getBoolean(4))
    assert(out(3).isNullAt(0) && out(3).isNullAt(4))
  }

  test("scriptSignals: per-script counts, ratio, dominant argmax") {
    val inputs = Seq(
      "abc Привет",       // 3 latin, 6 cyrillic -> cyrillic dominates
      "ab Пр",            // 2 vs 2 tie -> earlier class (latin) wins
      "123",              // digits only: no letters -> null dominant
      "你好世界",          // han only
      "안녕 abc1",         // hangul 2, latin 3 -> latin
      "αβγ",              // Greek: letters but no counted class
      "",
      null)
    val out = inputs.toDF("t")
      .select(scriptSignals($"t").as("s"))
      .select($"s.n_latin", $"s.n_cyrillic", $"s.n_han", $"s.n_hangul",
        $"s.n_digit", $"s.n_letters", $"s.latin_ratio", $"s.dominant")
      .collect()
    assert(out(0).getLong(0) == 3 && out(0).getLong(1) == 6 &&
      out(0).getLong(5) == 9 && out(0).getString(7) == "cyrillic")
    assert(out(0).getDouble(6) == 0.3333)
    assert(out(1).getLong(0) == 2 && out(1).getLong(1) == 2 &&
      out(1).getString(7) == "latin")
    assert(out(2).getLong(4) == 3 && out(2).getLong(5) == 0 &&
      out(2).isNullAt(7) && out(2).isNullAt(6))
    assert(out(3).getLong(2) == 4 && out(3).getString(7) == "han" &&
      out(3).getDouble(6) == 0.0)
    assert(out(4).getLong(3) == 2 && out(4).getLong(0) == 3 &&
      out(4).getLong(4) == 1 && out(4).getString(7) == "latin")
    // letters outside every counted class: counts 0, dominant null
    assert(out(5).getLong(5) == 3 && out(5).getLong(0) == 0 && out(5).isNullAt(7))
    assert(out(6).getLong(0) == 0 && out(6).isNullAt(6) && out(6).isNullAt(7))
    assert(out(7).isNullAt(0) && out(7).isNullAt(5) && out(7).isNullAt(7))
    // Latin-1 letters count as latin; × (00D7) excluded from the range
    val l1 = Seq("café ×").toDF("t")
      .select(scriptSignals($"t")("n_latin")).head().getLong(0)
    assert(l1 == 4)
  }

  test("deflateRatio: repetitive text compresses far below random") {
    val rep = "spam ham " * 500
    val rnd = (1 to 500).map(i =>
      java.util.UUID.nameUUIDFromBytes(Array(i.toByte, (i >> 8).toByte)))
      .mkString(" ")
    val out = Seq(rep, rnd, "", null).toDF("t")
      .select(graft.functions.TextAnalysis.deflateRatio($"t")).collect()
    assert(out(0).getDouble(0) < 0.1, s"repetitive: ${out(0).getDouble(0)}")
    assert(out(1).getDouble(0) > 0.3, s"random-ish: ${out(1).getDouble(0)}")
    assert(out(0).getDouble(0) < out(1).getDouble(0))
    assert(out(2).getDouble(0) == 1.0)
    assert(out(3).isNullAt(0))
  }

  test("normalizeUrl: idempotent (canonical forms are fixed points)") {
    val inputs = Seq(
      "https://a.com/p?utm_source=x&id=3",
      "HTTPS://Ex.COM/PaTh#frag",
      "http://a.com/?fbclid=z",
      "http://U.com/p/?utm_a=1&utm_b=2",
      "ftp://odd.scheme/x/", // non-http scheme: host untouched, slash trimmed
      "plain text, no url")
    val once = inputs.toDF("u")
      .select(graft.functions.TextAnalysis.normalizeUrl($"u")).as[String].collect().toSeq
    val twice = once.toDF("u")
      .select(graft.functions.TextAnalysis.normalizeUrl($"u")).as[String].collect().toSeq
    assert(twice == once, s"not idempotent: $once -> $twice")
  }

  test("urlHost: host without scheme/path/port/query, no-match → empty") {
    val df = Seq(
      "https://sub.ex.org/p/1?q=2",
      "http://a.io:8080/x",
      "https://plain.host",
      "not a url").toDF("u")
    val out = df.select(urlHost($"u").as("h")).as[String].collect().toSeq
    assert(out == Seq("sub.ex.org", "a.io", "plain.host", ""))
  }

  test("packingAssignment: offsets, seq spans, zero-token docs, boundary fits") {
    // seqLen 10; docs in id order: 4 + 0 + 10 + 7 + 12 tokens.
    val df = Seq(
      (1L, 4L),   // [0,4)   → seq 0 only
      (2L, 0L),   // empty   → null bounds, 0 seqs
      (3L, 10L),  // [4,14)  → seqs 0-1
      (4L, 7L),   // [14,21) → seqs 1-2
      (5L, 12L))  // [21,33) → seqs 2-3
      .toDF("id", "tokens")
    val out = packingAssignment(df, $"tokens", $"id", 10)
      .select($"id", $"start_offset", $"first_seq", $"last_seq", $"n_seqs")
      .as[(Long, Long, Option[Long], Option[Long], Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == ((0L, Some(0L), Some(0L), 1L)))
    assert(out(2L) == ((4L, None, None, 0L)))
    assert(out(3L) == ((4L, Some(0L), Some(1L), 2L)))
    assert(out(4L) == ((14L, Some(1L), Some(2L), 2L)))
    assert(out(5L) == ((21L, Some(2L), Some(3L), 2L)))
    // exact-boundary fit: a doc ending exactly at a multiple of
    // seqLen must NOT claim the next sequence
    val fit = packingAssignment(Seq((1L, 10L)).toDF("id", "tokens"),
      $"tokens", $"id", 10)
      .select($"first_seq", $"last_seq").as[(Long, Long)].head()
    assert(fit == ((0L, 0L)))
    intercept[IllegalArgumentException] {
      packingAssignment(df, $"tokens", $"id", 0)
    }
  }

  test("packingAssignment: matches a single-window oracle on 500 rows") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(1, 501).toDF("id")
      .withColumn("tokens", pmod(col("id") * 37 + 11, lit(93)).cast("long"))
      .repartition(7)
    val got = packingAssignment(df, $"tokens", $"id", 64)
      .select($"id", $"start_offset", $"first_seq", $"last_seq", $"n_seqs")
    val w = Window.orderBy($"id")
    val want = df
      .withColumn("cum", sum($"tokens").over(w))
      .withColumn("start_offset", $"cum" - $"tokens")
      .withColumn("first_seq", when($"tokens" > 0, expr("start_offset div 64")))
      .withColumn("last_seq", when($"tokens" > 0, expr("(cum - 1) div 64")))
      .withColumn("n_seqs", coalesce($"last_seq" - $"first_seq" + 1, lit(0L)))
      .select($"id", $"start_offset", $"first_seq", $"last_seq", $"n_seqs")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("lmScore: add-1 bigram model matches the hand-computed values") {
    // corpus: d1 = "a b a b", d2 = "a b c", d3 = "x" (single token)
    // topV=2 → vocab {a, b} (counts a:3 b:3 c:1 x:1; ties token-asc),
    // V = 3 (with <unk>); mapped unigrams a:3 b:3 <unk>:2
    // bigrams: (a,b):3  (b,a):1  (b,<unk>):1
    val df = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x")).toDF("id", "text")
    val out = lmScore(df, "text", "id", topV = 2)
      .select($"id", $"n_bigrams", $"avg_logprob")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), Option(r.get(2)))).toMap
    val lpAB = math.log((3 + 1.0) / (3 + 3.0)) // c(a,b)=3, c(a)=3, kV=3
    val lpBA = math.log((1 + 1.0) / (3 + 3.0))
    val lpBU = math.log((1 + 1.0) / (3 + 3.0))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((3L, Some(r4((lpAB * 2 + lpBA) / 3)))))
    assert(out(2L) == ((2L, Some(r4((lpAB + lpBU) / 2)))))
    assert(out(3L) == ((0L, None))) // < 2 tokens: no bigrams, null score
  }

  test("lmScore: vocab cut is deterministic under count ties") {
    // all counts equal → topV=2 keeps the lexicographically smallest
    val df = Seq((1L, "d c b a")).toDF("id", "text")
    val out = lmScore(df, "text", "id", topV = 2)
      .select($"avg_logprob").as[Double].head()
    // tokens a..d count 1 each → vocab {a, b}; V=3; mapped bigrams
    // (<unk>,<unk>):1 (<unk>,b):1 (b,a):1 with c(<unk>)=2, c(b)=1, c(a)=1
    val want = (math.log(2.0 / 5) + math.log(2.0 / 5) + math.log(2.0 / 4)) / 3
    assert(math.abs(out - want) < 1e-4)
  }

  test("dupNgramStats: shared 5-gram fractions, short-doc whole-join") {
    val df = Seq(
      (1L, "x1 x2 x3 x4 x5 u1 u2"), // 3 grams, 1 shared
      (2L, "x1 x2 x3 x4 x5 v1"), // 2 grams, 1 shared
      (3L, "q1 q2 q3 q4 q5 q6"), // 2 grams, 0 shared
      (4L, "tiny doc"), // < 5 tokens: whole join as 1 gram
      (5L, "tiny doc")) // exact short dup of 4
      .toDF("id", "text")
    val out = dupNgramStats(df, "text", "id", n = 5)
      .select($"id", $"n_grams", $"dup_ngram_frac")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((3L, 0.3333)))
    assert(out(2L) == ((2L, 0.5)))
    assert(out(3L) == ((2L, 0.0)))
    assert(out(4L) == ((1L, 1.0)))
    assert(out(5L) == ((1L, 1.0)))
  }

  private def windowNodes(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.size

  test("dupNgramStats: hot gram in every doc — correct, and no window over the gram key") {
    // one 5-gram shared by ALL docs: a window partitioned on the gram
    // would put every doc's row on one task; the groupBy+join shape
    // must not contain a Window node at all.
    val hot = "h1 h2 h3 h4 h5"
    val df = (1L to 40L).map(i => (i, s"$hot u${i}a u${i}b u${i}c u${i}d")).toDF("id", "text")
    val out = dupNgramStats(df, "text", "id", n = 5)
    assert(windowNodes(out) == 0)
    val got = out.select($"id", $"n_grams", $"dup_ngram_frac")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    // each doc: 5 distinct grams, exactly 1 (the hot one) shared
    assert(got == Set((5L, 0.2)))
  }

  test("removeSharedSpans: lowest-id doc keeps, others cut covered tokens") {
    val df = Seq(
      (1L, "a b c d e x y"), // keeper of "a b c d e"
      (2L, "p q a b c d e z"), // cuts idx 2..6 → "p q z"
      (3L, "m n o p q r"), // no shared grams
      (4L, "tiny doc"), // shorter than n tokens: never cut
      (5L, "p q a b c d e z")) // every gram kept by 1 or 2 → fully cut
      .toDF("id", "text")
    val out = removeSharedSpans(df, "text", "id", n = 5, minDocs = 2)
    assert(windowNodes(out) == 0)
    val got = out.select($"id", $"text").as[(Long, String)].collect().toMap
    assert(got(1L) == "a b c d e x y") // untouched, byte-for-byte
    assert(got(2L) == "p q z")
    assert(got(3L) == "m n o p q r")
    assert(got(4L) == "tiny doc")
    assert(got(5L) == "")
    // all non-text columns survive, schema order intact
    assert(out.columns.toSeq == Seq("id", "text"))
  }

  test("removeSharedSpans: overlapping shared spans merge; poisoned column names survive") {
    // doc 11/12 share BOTH "a b c" and "b c d" (overlapping): doc 12
    // cuts the union of covered tokens, not twice
    val df = Seq(
      (11L, "a b c d", "x"),
      (12L, "z a b c d", "y"))
      .toDF("id", "text", "__starts") // poisoned user column
    val out = removeSharedSpans(df, "text", "id", n = 3, minDocs = 2)
    val got = out.select($"id", $"text", $"__starts")
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(11L) == (("a b c d", "x")))
    assert(got(12L) == (("z", "y")))
  }

  test("lmScore: OOV-dominated corpus — correct, and no window over the bigram key") {
    // topV=1 keeps only "a"; every other token maps to <unk>, so the
    // (<unk>,<unk>) bigram bucket holds most of the corpus — the
    // pathological key a window partition would serialize.
    val df = (1L to 30L).map(i => (i, s"a a z${i}p z${i}q z${i}r")).toDF("id", "text")
    val out = lmScore(df, "text", "id", topV = 1)
    assert(windowNodes(out) == 0)
    // per doc: bigrams (a,a) (a,u) (u,u) (u,u); c(a,a)=30, c(a,u)=30,
    // c(u,u)=60; c1: a=60, unk=90; V=2
    val lpAA = math.log((30 + 1.0) / (60 + 2.0))
    val lpAU = math.log((30 + 1.0) / (60 + 2.0))
    val lpUU = math.log((60 + 1.0) / (90 + 2.0))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = r4((lpAA + lpAU + lpUU * 2) / 4)
    val got = out.select($"n_bigrams", $"avg_logprob")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((4L, want)))
  }

  test("entropySignals: null text -> null fields; empty -> (0.0, 1.0)") {
    val df = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, ""),
      (3L, "aabb")).toDF("id", "t")
    val out = df.select($"id", entropySignals($"t").as("e"))
      .select($"id", $"e.char_entropy", $"e.printable_ratio")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(out(1L) == ((None, None)))
    assert(out(2L) == ((Some(0.0), Some(1.0))))
    assert(out(3L) == ((Some(1.0), Some(1.0)))) // two equiprobable chars
  }

  test("lmScore3: hand-computed interpolated trigram scores, no window in the plan") {
    // 10 docs "a a b z{i}": voc(topV=2) = {a, b}, V = 3;
    // c1: a=20 b=10 unk=10; c12: (a,a)=10 (a,b)=10 (b,u)=10;
    // c123: (a,a,b)=10 (a,b,u)=10
    val df = (1L to 10L).map(i => (i, s"a a b z${i}")).toDF("id", "text")
    val out = lmScore3(df, "text", "id", topV = 2)
    assert(windowNodes(out) == 0)
    val lp1 = math.log(0.5 * 11.0 / 13 + 0.5 * 11.0 / 23) // (a,a,b)
    val lp2 = math.log(11.0 / 13)                         // (a,b,u): both halves 11/13
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = out.select($"n_trigrams", $"avg_logprob")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((2L, r4((lp1 + lp2) / 2))))
    // a 2-token doc scores 0 trigrams with null avg
    val tiny = lmScore3(Seq((1L, "a b"), (2L, "a a b c")).toDF("id", "text"), "text", "id", topV = 2)
      .select($"id", $"n_trigrams").as[(Long, Long)].collect().toMap
    assert(tiny(1L) == 0L && tiny(2L) == 2L)
  }

  test("fixEncoding: mojibake repaired, CRLF folded, controls stripped, tab/LF kept") {
    def fix(s: String): String =
      Seq(Tuple1(s)).toDF("t").select(fixEncoding($"t").as("f"))
        .as[String].collect().head
    // every pair repairs to its target
    mojibakePairs.foreach { case (k, v) =>
      assert(fix(s"x${k}y") == s"x${v}y", s"pair $k")
    }
    // CRLF and bare CR fold to LF; LF and tab survive
    assert(fix("a\r\nb\rc\nd\te") == "a\nb\nc\nd\te")
    // C0 (except \t\n), DEL, and C1 controls are stripped
    assert(fix("a\u0000b\u0007c\u000bd\u007fe\u009bf") == "abcdef")
    // clean ASCII is untouched
    assert(fix("plain text stays") == "plain text stays")
    // pipeline composition: repair before stripHtml keeps entities intact
    assert(fix("itâ€™s &amp; fine") == "it’s &amp; fine")
  }

  test("bm25TopK: ranking follows tf, idf and length normalization") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "zebra common filler filler filler"),        // rare term
      (2L, "common filler filler filler filler"),       // common only
      (3L, "zebra zebra common filler filler"),         // rare term twice
      (4L, "zebra " + Seq.fill(50)("filler").mkString(" ")), // rare, long doc
      (5L, "nothing relevant here at all"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(df, "text", "doc_id",
      Seq("zebra", "common"), k = 10)
      .select(col("doc_id"), col("bm25")).as[(Long, Double)].collect()
    val score = out.toMap
    assert(!score.contains(5L)) // no query term -> excluded
    assert(score(3L) > score(1L), "higher tf must outrank")
    assert(score(1L) > score(2L), "rare term must outrank common-only")
    assert(score(1L) > score(4L), "same tf, shorter doc must outrank")
    // top-1 is the double-zebra doc
    assert(out.maxBy(_._2)._1 == 3L)
  }

  test("bm25TopK: partition-invariant, k truncates, ties break on id") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 100L).map(i => (i, if (i % 2 == 0) "hit text" else "miss text"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.bm25TopK(docs, "text", "doc_id", Seq("hit"), k = 7)
      .as[(Long, Double)].collect().toSeq
    val b = TextAnalysis.bm25TopK(docs.repartition(13), "text", "doc_id",
      Seq("hit"), k = 7).as[(Long, Double)].collect().toSeq
    assert(a == b)
    assert(a.length == 7)
    // all matching docs tie on score -> smallest ids win
    assert(a.map(_._1) == Seq(2L, 4L, 6L, 8L, 10L, 12L, 14L))
  }

  test("postingLists: df gates, ascending postings, cap keeps smallest ids") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (10L, "alpha beta beta gamma"),
      (3L, "alpha gamma"),
      (7L, "alpha delta"),
      (5L, "epsilon")).toDF("doc_id", "text")
    val out = TextAnalysis.postingLists(df, "text", "doc_id", minDf = 2)
      .select(col("token"), col("df_count"), col("n_postings"), col("postings"))
      .as[(String, Long, Int, Seq[Long])].collect()
      .map(r => r._1 -> r).toMap
    // hapaxes (beta counts once per doc; delta/epsilon df=1) gated out
    assert(out.keySet == Set("alpha", "gamma"))
    assert(out("alpha") == (("alpha", 3L, 3, Seq(3L, 7L, 10L))))
    assert(out("gamma") == (("gamma", 2L, 2, Seq(3L, 10L))))
    // cap: emitted list truncates to the smallest ids, df stays full
    val capped = TextAnalysis.postingLists(df, "text", "doc_id",
      minDf = 2, maxPostings = 2)
      .select(col("token"), col("df_count"), col("postings"))
      .as[(String, Long, Seq[Long])].collect().map(r => r._1 -> r).toMap
    assert(capped("alpha") == (("alpha", 3L, Seq(3L, 7L))))
  }

  test("postingLists: maxDf drops stopwords before any list; partition-invariant") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 50L).map(i =>
      (i, "the common" + (if (i <= 5) " rare" else ""))).toDF("doc_id", "text")
    val out = TextAnalysis.postingLists(docs, "text", "doc_id",
      minDf = 2, maxDf = 10)
      .select(col("token"), col("df_count")).as[(String, Long)].collect().toMap
    assert(out == Map("rare" -> 5L)) // the/common at df=50 gated out
    val a = TextAnalysis.postingLists(docs, "text", "doc_id", minDf = 2, maxDf = 10)
      .collect().toSet
    val b = TextAnalysis.postingLists(docs.repartition(13), "text", "doc_id",
      minDf = 2, maxDf = 10).collect().toSet
    assert(a == b)
  }

  test("readability: hand-computed counts and score; null/empty/degenerate") {
    val docs = Seq(
      (1L, "The cat sat. It ran!"), // 5 words, 2 sents, 5 vowel groups
      (2L, "zzz brr"), // consonant-only: 0 vowel groups, sents floor 1
      (3L, ""), // empty: 0 words -> null score
      (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = graft.functions.TextAnalysis.readability(docs, "text")
      .select($"id", $"n_words", $"n_sents", $"n_vowel_groups", $"flesch")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == (1L, Some(5L), Some(2L), Some(5L), Some(119.6975)))
    assert(out(2L)._3.contains(1L) && out(2L)._4.contains(0L), "floor + no vowels")
    assert(out(2L)._5.contains(204.805))
    // exact-integer rule (the sf1 gate caught flesch = 91.01865 — a
    // TRUE 4 dp half-boundary where double rounds disagree across
    // engines): operator == the long-arithmetic reference on random
    // word/terminator mixes, incl. boundary-prone count triples
    val rnd = new scala.util.Random(3)
    val docs2 = (0 until 40).map { i =>
      val body = Seq.fill(3 + rnd.nextInt(60))(
        Seq("cat", "zz", "idea", "brr!", "so.", "aa")(rnd.nextInt(6))).mkString(" ")
      (i.toLong, body)
    }
    val got = graft.functions.TextAnalysis.readability(docs2.toDF("id", "text"), "text")
      .select($"id", $"n_words", $"n_sents", $"n_vowel_groups", $"flesch")
      .as[(Long, Long, Long, Long, Double)].collect()
    got.foreach { case (id, w, s, v, f) =>
      val rn = 2068350L * s * w - 10150L * w * w - 846000L * v * s
      val e4 = if (rn >= 0) (rn * 2 + s * w) / (s * w * 2)
        else -(((-rn) * 2 + s * w) / (s * w * 2))
      assert(f == e4.toDouble / 10000.0, s"doc $id ($w/$s/$v)")
    }
    assert(out(3L)._2.contains(0L) && out(3L)._5.isEmpty, "empty -> null score")
    assert(out(4L)._2.isEmpty && out(4L)._5.isEmpty, "null text -> nulls")
  }

  test("zipfFit: matches the decimal-moment reference; gates and degenerate cases") {
    // counts: a=8, b=4, c=2 (ranks 1, 2, 3); d appears once -> gated
    val docs = Seq(
      "a a a a a a a a b b",
      "b b c c d").toDF("text")
    val out = graft.functions.TextAnalysis.zipfFit(docs, "text", topN = 1000, minCount = 2L)
      .as[(Long, Option[Double], Option[Double])].head()
    assert(out._1 == 3L, "d gated by minCount")
    // reference: same 6 dp rounds, exact micro-unit sums, one solve
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pts = Seq((1, 8), (2, 4), (3, 2)).map { case (r, c) =>
      (r6(math.log(r.toDouble)), r6(math.log(c.toDouble)))
    }
    def dsum(vs: Seq[Double]) = vs.map(v => math.round(v * 1e6)).sum / 1e6
    val (n, sx, sy) = (3.0, dsum(pts.map(_._1)), dsum(pts.map(_._2)))
    val sxx = dsum(pts.map(p => r6(p._1 * p._1)))
    val sxy = dsum(pts.map(p => r6(p._1 * p._2)))
    val sl = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(out._2.contains(r6(sl)), s"slope ${out._2} vs ${r6(sl)}")
    assert(out._3.contains(r6((sy - sl * sx) / n)))
    // near -1 for the geometric counts (sanity of the sign convention)
    assert(out._2.get < -0.9 && out._2.get > -1.6, out._2)
    // topN truncation: with topN=2 only a and b fit
    assert(graft.functions.TextAnalysis.zipfFit(docs, "text", topN = 2, minCount = 1L)
      .as[(Long, Option[Double], Option[Double])].head()._1 == 2L)
    // fewer than 2 surviving terms -> null slope, not a crash
    val one = Seq("z z z").toDF("text")
    val deg = graft.functions.TextAnalysis.zipfFit(one, "text", topN = 10, minCount = 2L)
      .as[(Long, Option[Double], Option[Double])].head()
    assert(deg._1 == 1L && deg._2.isEmpty && deg._3.isEmpty)
    intercept[IllegalArgumentException] {
      graft.functions.TextAnalysis.zipfFit(docs, "text", topN = 1)
    }
    // the rank window's report bound is checked, not just documented
    val cap = intercept[IllegalArgumentException] {
      graft.functions.TextAnalysis.zipfFit(docs, "text", topN = 100001)
    }
    assert(cap.getMessage.contains("topN"))
  }

  test("pmiCollocations: hand-computed values, tie-break, minCount gate") {
    val df = Seq("a b a b", "a b c").toDF("text")
    val out = TextAnalysis.pmiCollocations(df, "text", minCount = 1L, k = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    // U=7 (a:3 b:3 c:1), T=5: (a,b):3, (b,a):1, (b,c):1
    // pmi(a,b) = ln((3/5)/((3/7)^2)) = pmi(b,c) — a genuine tie,
    // broken on w1; (b,a) trails.
    assert(out.map(r => (r._1, r._2)) == Seq(("a", "b"), ("b", "c"), ("b", "a")))
    assert(math.abs(out(0)._4 - math.log((3.0 / 5) / ((3.0 / 7) * (3.0 / 7)))) < 1e-6)
    assert(out(0)._4 == out(1)._4)
    assert(out(0)._3 == 3L && out(1)._3 == 1L)
    val gated = TextAnalysis.pmiCollocations(df, "text", minCount = 2L, k = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(gated.map(r => (r._1, r._2)) == Seq(("a", "b")))
  }

  test("pmiCollocations: k truncation and partitioning invariance") {
    val rnd = new scala.util.Random(7)
    val docs = Seq.fill(60)(Seq.fill(12)(s"w${rnd.nextInt(9)}").mkString(" "))
    val df = docs.toDF("text")
    val a = TextAnalysis.pmiCollocations(df, "text", 2L, 5).collect().toSeq
    assert(a.size == 5)
    val b = TextAnalysis.pmiCollocations(df.repartition(13), "text", 2L, 5)
      .collect().toSeq
    assert(a == b)
  }

  test("splitSentences: terminator runs, trailing fragment, trim, empties dropped") {
    val df = Seq(
      (1L, "One. Two!! Three? tail"),
      (2L, "...???"),
      (3L, ""),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.splitSentences(df, "text", "doc_id")
      .as[(Long, Int, String)].collect().toSet
    // doc 2 is pure punctuation — the pattern needs at least one
    // non-terminator char, so it yields no sentences (like 3 and 4)
    assert(out == Set(
      (1L, 0, "One."), (1L, 1, "Two!!"), (1L, 2, "Three?"), (1L, 3, "tail")))
  }

  test("splitSentences: indexes follow document order after repartition") {
    val text = (1 to 30).map(i => s"s$i.").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text").repartition(7)
    val out = TextAnalysis.splitSentences(df, "text", "doc_id")
      .as[(Long, Int, String)].collect().sortBy(_._2)
    assert(out.map(_._3).toSeq == (1 to 30).map(i => s"s$i."))
  }

  test("classTopTerms: distinctive vocabulary outranks shared vocabulary") {
    val df = Seq(("X", "x x shared"), ("Y", "y shared")).toDF("cls", "text")
    val out = TextAnalysis.classTopTerms(df, "text", "cls", k = 10)
      .as[(String, String, Double, Int)].collect()
      .map(r => (r._1, r._4) -> ((r._2, r._3))).toMap
    // X: x:2 shared:1 (n=3); Y: y:1 shared:1 (n=2); A=2.5; ft x=2 shared=2 y=1
    assert(out(("X", 1))._1 == "x" && out(("Y", 1))._1 == "y")
    assert(out(("X", 2))._1 == "shared" && out(("Y", 2))._1 == "shared")
    assert(math.abs(out(("X", 1))._2 - (2.0 / 3) * math.log(1 + 2.5 / 2)) < 1e-6)
    assert(math.abs(out(("Y", 1))._2 - 0.5 * math.log(1 + 2.5 / 1)) < 1e-6)
  }

  test("classTopTerms: k bound per class and deterministic term tie-break") {
    val df = Seq(("X", "a b c d e"), ("Y", "a b c d e")).toDF("cls", "text")
    val out = TextAnalysis.classTopTerms(df, "text", "cls", k = 3)
      .as[(String, String, Double, Int)].collect().toSeq
    assert(out.count(_._1 == "X") == 3 && out.count(_._1 == "Y") == 3)
    // all scores tie → alphabetic ranks
    assert(out.filter(_._1 == "X").sortBy(_._4).map(_._2) == Seq("a", "b", "c"))
  }

  test("corpusDiversity: hand counts, collapse detection, short docs, null drop") {
    // slice A: two clones — 4 occurrences total (2 each), 2 distinct grams
    // slice B: two disjoint docs — 4 occurrences, 4 distinct
    val df = Seq(
      ("A", "x y z w"), ("A", "x y z w"),
      ("B", "a b c d"), ("B", "e f g h"),
      ("C", "tiny"), // shorter than n → 1 occurrence, 1 whole-text shingle
      ("D", null.asInstanceOf[String])).toDF("g", "text")
    val out = TextAnalysis.corpusDiversity(df, "text", "g", n = 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(out("A") == ((2L, 4L, 2L, 0.5)), "clones collapse the ratio")
    assert(out("B") == ((2L, 4L, 4L, 1.0)), "disjoint docs keep it at 1")
    assert(out("C") == ((1L, 1L, 1L, 1.0)))
    assert(!out.contains("D"), "null text rows drop")
  }

  test("corpusDiversity: repartition-invariant") {
    val docs = (1 to 120).map(i => (s"g${i % 3}", s"w${i % 11} w${i % 7} w${i % 5} w${i % 2}"))
      .toDF("g", "text")
    val one = TextAnalysis.corpusDiversity(docs, "text", "g").collect().toSet
    val many = TextAnalysis.corpusDiversity(docs.repartition(13), "text", "g")
      .collect().toSet
    assert(one == many)
  }

  test("noveltyScore: clone 0, disjoint 1, half-overlap 0.5, short-doc shingle") {
    val docs = Seq(
      (1L, "alpha beta gamma"), // clone of ref → 0
      (2L, "zeta eta theta"),   // disjoint → 1
      (3L, "alpha beta kappa"), // grams {alpha beta, beta kappa}: 1 of 2 seen
      (4L, "word")              // shorter than n → whole-text shingle
    ).toDF("doc_id", "text")
    val ref = Seq("alpha beta gamma", "word").toDF("rt")
    val out = TextAnalysis.noveltyScore(docs, ref, "text", "doc_id", "rt", n = 2)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 2L, 0.0)))
    assert(out(2L) == ((2L, 2L, 0L, 1.0)))
    assert(out(3L) == ((3L, 2L, 1L, 0.5)))
    assert(out(4L) == ((4L, 1L, 1L, 0.0)), "short doc matches via whole-text shingle")
  }

  test("noveltyScore: repartition-invariant") {
    val docs = (1 to 100).map(i => (i.toLong, s"w${i % 9} w${i % 7} w${i % 5} w${i % 3}"))
      .toDF("doc_id", "text")
    val ref = (1 to 40).map(i => s"w${i % 9} w${i % 7} w${i % 5}").toDF("rt")
    val one = TextAnalysis.noveltyScore(docs, ref, "text", "doc_id", "rt", n = 3)
      .collect().toSet
    val many = TextAnalysis.noveltyScore(
      docs.repartition(13), ref.repartition(7), "text", "doc_id", "rt", n = 3)
      .collect().toSet
    assert(one == many)
  }

  test("heapsLaw: exact power law recovers beta and K; counts are exact") {
    import graft.functions.TextAnalysis
    // Build docs so V(N) = N^0.5 exactly at every boundary: doc d
    // adds tokens so cumulative N = d^2 and introduces d new words
    // ... simpler exact construction: V = N (every token new) gives
    // beta = 1, K = 1.
    val allNew = (1 to 10).map(d =>
      (d.toLong, (0 until 5).map(i => s"w_${d}_$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r1 = TextAnalysis.heapsLaw(allNew, "text", "doc_id").head()
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) == ((10L, 50L, 50L)))
    assert(r1.getDouble(3) == 1.0 && r1.getDouble(4) == 1.0)
    // a fully repetitive tail: vocab stops growing, beta < 1
    val repetitive = allNew.union(
      (11 to 30).map(d => (d.toLong, "w_1_0 w_1_1 w_1_2 w_1_3 w_1_4"))
        .toDF("doc_id", "text"))
    val r2 = TextAnalysis.heapsLaw(repetitive, "text", "doc_id").head()
    assert(r2.getLong(2) == 50L && r2.getDouble(3) < 0.7,
      s"beta should collapse, got ${r2.getDouble(3)}")
    // determinism under repartitioning
    val r3 = TextAnalysis.heapsLaw(repetitive.repartition(7), "text", "doc_id")
      .head()
    assert(r3 == r2)
    // blank docs contribute zero tokens, null ids drop
    val withBlank = allNew.union(Seq((31L, "   ")).toDF("doc_id", "text"))
    val r4 = TextAnalysis.heapsLaw(withBlank, "text", "doc_id").head()
    assert(r4.getLong(0) == 11L && r4.getLong(1) == 50L)
  }
}
