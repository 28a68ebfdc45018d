package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Persian/Arabic-aware text + calendar functions.
  *
  * Re-expression of the text half of the reference's
  * `kolang/column_functions.py`. Pure `functions._` compositions
  * (translate / regexp_replace / format_string) — codegen-friendly,
  * no UDFs, so they stay inside WholeStageCodegen at any scale.
  */
object TextFunctions {

  /** Normalize Arabic (٠-٩) and Persian (۰-۹) digits to ASCII
    * (reference column_functions.py:138 `number_normalizer`).
    */
  def numberNormalizer(c: Column): Column =
    translate(
      translate(c, "٠١٢٣٤٥٦٧٨٩", "0123456789"),
      "۰۱۲۳۴۵۶۷۸۹",
      "0123456789")

  /** Strip emoji/symbols, keeping English + Persian letters, digits,
    * spaces and `accept` chars; normalizes Arabic letter variants to
    * Persian and collapses runs of spaces
    * (reference column_functions.py:219 `text_cleaner`).
    */
  def textCleaner(c: Column, accept: String = ""): Column = {
    val normalized = translate(numberNormalizer(c), "كيأإؤةۀ", "کیااوهه")
    val kept = regexp_replace(normalized, s"[^a-zآ-یA-Z0-9 $accept]", " ")
    regexp_replace(kept, " {2,}", " ")
  }

  /** Format a number then map ASCII digits to Persian digits
    * (reference column_functions.py:335 `persian_number`).
    */
  def persianNumber(c: Column, format: String = "%d"): Column =
    translate(
      format_string(format, c),
      "0123456789",
      "۰۱۲۳۴۵۶۷۸۹")

  private val jMonthNames = Seq(
    "فروردین", "اردیبهشت", "خرداد", "تیر", "مرداد", "شهریور",
    "مهر", "آبان", "آذر", "دی", "بهمن", "اسفند")

  private val jWeekNames = Seq(
    "شنبه", "یکشنبه", "دوشنبه", "سه شنبه", "چهارشنبه", "پنجشنبه", "جمعه")

  private val jSeasonNames = Seq("بهار", "تابستان", "پاییز", "زمستان")

  /** Jalali (Solar Hijri) calendar fields for a Gregorian date column:
    * (year, month, day) as numeric columns. Standard public-domain
    * Gregorian→Jalali day-count arithmetic; same algorithm family the
    * reference uses (reference column_functions.py:354 `jalali_date`).
    *
    * One native kernel ([[JalaliKernel]]) instead of the equivalent
    * `when`-chain columns: a format string references these fields
    * several times, and the inlined chains blew past Janino's 64 KB
    * method limit — disabling whole-stage codegen for the whole
    * stage. The struct is shared, so the kernel runs once per row.
    */
  def jalaliYmd(c: Column): (Column, Column, Column) = {
    import org.apache.spark.sql.GraftSqlBridge
    val s = GraftSqlBridge.column(JalaliYmd(
      GraftSqlBridge.expression(year(c)),
      GraftSqlBridge.expression(dayofyear(c))))
    (s.getField("jy"), s.getField("jm"), s.getField("jd"))
  }

  private val jDaysCum = Seq(0, 31, 62, 93, 124, 155, 186, 216, 246, 276, 306, 336)

  /** Gregorian date for Jalali (jy, jm, jd) numeric columns — the
    * inverse of [[jalaliYmd]] (the reference only converts forward).
    * The Jalali day count uses the standard 33-year-cycle arithmetic
    * (8 leap years per cycle — the same cycle the forward direction's
    * 12053/1461 decomposition encodes); the Gregorian side is just
    * `date_add` from the 1600-01-01 epoch, so no decomposition chain
    * and no codegen blow-up. Round-trip verified over five centuries
    * in TextFunctionsSpec.
    */
  def jalaliToGregorian(jy: Column, jm: Column, jd: Column): Column = {
    val jy2 = jy - 979
    val jDayNo =
      lit(365) * jy2 + floor(jy2 / 33) * 8 + floor((pmod(jy2, lit(33)) + 3) / 4) +
        element_at(array(jDaysCum.map(lit): _*), jm.cast("int")) + (jd - 1)
    val gDayNo = jDayNo + 79
    date_add(to_date(lit("1600-01-01")), gDayNo.cast("int"))
  }

  /** Gregorian date for a "%Y-%m-%d"-formatted Jalali string — the
    * inverse of `jalaliDate(c)` with the default format.
    */
  def jalaliToGregorian(c: Column): Column = {
    val p = split(c, "-")
    jalaliToGregorian(
      element_at(p, 1).cast("int"),
      element_at(p, 2).cast("int"),
      element_at(p, 3).cast("int"))
  }

  /** Format a Gregorian date column as a Jalali date string
    * (reference column_functions.py:354 `jalali_date`).
    *
    * Format tokens: %d %m %y %Y (numeric), %fd %fm %fy %fY (Persian
    * digits), %B month name, %A weekday name, %C season name.
    */
  def jalaliDate(c: Column, format: String = "%Y-%m-%d"): Column = {
    val (jy, jm, jd) = jalaliYmd(c)
    val gwd = dayofweek(c)

    val monthArr = array(jMonthNames.map(lit): _*)
    val weekArr = array(jWeekNames.map(lit): _*)
    val seasonArr = array(jSeasonNames.map(lit): _*)

    // token -> (java format spec, column argument)
    val tokenMap: Seq[(String, (String, Column))] = Seq(
      "%fd" -> (("%s", persianNumber(jd, "%02d"))),
      "%fm" -> (("%s", persianNumber(jm, "%02d"))),
      "%fy" -> (("%s", persianNumber(jy % 100, "%02d"))),
      "%fY" -> (("%s", persianNumber(jy, "%d"))),
      "%d" -> (("%02d", jd)),
      "%m" -> (("%02d", jm)),
      "%y" -> (("%02d", jy % 100)),
      "%Y" -> (("%d", jy)),
      "%B" -> (("%s", element_at(monthArr, jm.cast("int")))),
      // weekday index: dayofweek is 1=Sunday..7=Saturday; Persian week
      // starts Saturday → names[dayofweek % 7] (0-based).
      "%A" -> (("%s", element_at(weekArr, (gwd % 7) + 1))),
      "%C" -> (("%s", element_at(seasonArr, floor((jm - 1) / 3).cast("int") + 1))))

    // Single-pass tokenization (longest-match first) into a java
    // format string plus ordered column arguments.
    val tokens = tokenMap.map(_._1)
    val lookup = tokenMap.toMap
    val fmt = new StringBuilder
    val args = scala.collection.mutable.ArrayBuffer.empty[Column]
    var i = 0
    while (i < format.length) {
      tokens.find(t => format.startsWith(t, i)) match {
        case Some(t) =>
          val (spec, arg) = lookup(t)
          fmt ++= spec
          args += arg
          i += t.length
        case None =>
          val ch = format.charAt(i)
          if (ch == '%') fmt ++= "%%" else fmt += ch
          i += 1
      }
    }
    format_string(fmt.toString, args.toSeq: _*)
  }
}
