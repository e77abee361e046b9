package graft.infer

import scala.collection.mutable.ListBuffer

/** Translates Go reference-time layouts (the `--time-format` flag,
  * default `2006-01-02 15:04:05-0700` at `/root/reference/write.go:31`)
  * into Java `DateTimeFormatter` patterns usable by both the JVM parser
  * and Spark's `to_timestamp`.
  *
  * Only the layout tokens that can appear in a Go time layout are mapped;
  * any literal text is quoted for Java. Longest-token-first matching
  * mirrors how Go's time package scans layouts.
  */
object GoTimeFormat {
  // (go token, java pattern) — longest first so "2006" wins over "06", etc.
  private val tokens: Seq[(String, String)] = Seq(
    "2006" -> "yyyy",
    "January" -> "MMMM",
    "Jan" -> "MMM",
    "Monday" -> "EEEE",
    "Mon" -> "EEE",
    "01" -> "MM",
    "02" -> "dd",
    "_2" -> "d",   // space-padded day: closest Java match
    "15" -> "HH",
    "03" -> "hh",
    "04" -> "mm",
    "05" -> "ss",
    "06" -> "yy",
    "PM" -> "a",
    "pm" -> "a",
    ".000000000" -> ".SSSSSSSSS",
    ".000000" -> ".SSSSSS",
    ".000" -> ".SSS",
    "-07:00" -> "XXX",
    "-0700" -> "Z",
    "-07" -> "X",
    "Z07:00" -> "XXX",
    "Z0700" -> "XX", // X accepts a literal 'Z' for UTC like Go; 'ZZ' doesn't
    "MST" -> "zzz",
    "1" -> "M",
    "2" -> "d",
    "3" -> "h",
    "4" -> "m",
    "5" -> "s"
  )

  def toJavaPattern(goLayout: String): String = {
    val out = new ListBuffer[String]
    var i = 0
    val n = goLayout.length
    val literal = new StringBuilder
    def flushLiteral(): Unit = if (literal.nonEmpty) {
      val s = literal.toString
      // quote literal text for DateTimeFormatter if it contains letters
      out += (if (s.exists(_.isLetter)) "'" + s.replace("'", "''") + "'" else s)
      literal.clear()
    }
    while (i < n) {
      tokens.find { case (go, _) => goLayout.startsWith(go, i) } match {
        case Some((go, java)) =>
          flushLiteral(); out += java; i += go.length
        case None =>
          literal.append(goLayout.charAt(i)); i += 1
      }
    }
    flushLiteral()
    out.mkString
  }

  /** The reference default layout, pre-translated. */
  val defaultGoLayout = "2006-01-02 15:04:05-0700"
  val defaultJavaPattern: String = toJavaPattern(defaultGoLayout) // yyyy-MM-dd HH:mm:ssZ
}
