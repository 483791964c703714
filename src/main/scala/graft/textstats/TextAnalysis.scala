package graft.textstats

import scala.collection.mutable

/**
 * Pure text-analysis primitives for the training-data pipeline operators
 * (dedup, quality filtering, language ID, fingerprinting). All deterministic;
 * used from Catalyst built-ins where possible and from typed maps otherwise.
 * The reference's langdetect call (/root/reference/core/scraper.py:270-275)
 * is RNG-seeded, so the byte contract passes the input `lang` column through;
 * this trigram classifier is the deterministic recompute option.
 */
object TextAnalysis {

  // ---------- language ID (character n-gram heuristic) ----------

  /** Tiny stopword profile per Latin-script language — deterministic
    * heuristic, not a model. Round-4 breadth (VERDICT r03 next #8): the
    * original 6 (synthetic-corpus languages) plus nl/pl/sv/ro/tr/id/vi/cs,
    * the most common Latin-script web languages that previously collapsed
    * to whichever profile accidentally matched. Ties at equal score pick
    * the lexicographically smaller code (deterministic, order-free). */
  private val profiles: Map[String, Set[String]] = Map(
    "en" -> Set(" the ", " and ", " of ", " to ", " in ", " is ", " that ", " it ", " for ", " with "),
    "de" -> Set(" der ", " die ", " und ", " das ", " ist ", " nicht ", " ein ", " mit ", " für ", " von "),
    "fr" -> Set(" le ", " la ", " les ", " des ", " est ", " une ", " dans ", " pour ", " que ", " avec "),
    "es" -> Set(" el ", " la ", " los ", " las ", " es ", " una ", " para ", " que ", " con ", " del "),
    "pt" -> Set(" o ", " a ", " os ", " as ", " é ", " uma ", " para ", " que ", " com ", " não "),
    "it" -> Set(" il ", " la ", " che ", " di ", " è ", " una ", " per ", " con ", " del ", " non "),
    "nl" -> Set(" de ", " het ", " een ", " van ", " dat ", " niet ", " zijn ", " voor ", " maar ", " ook "),
    "pl" -> Set(" nie ", " się ", " jest ", " że ", " do ", " na ", " jak ", " ale ", " przez ", " tego "),
    "sv" -> Set(" och ", " att ", " det ", " som ", " är ", " av ", " för ", " med ", " på ", " den "),
    "ro" -> Set(" și ", " este ", " pentru ", " care ", " într ", " din ", " mai ", " sunt ", " fost ", " după "),
    "tr" -> Set(" ve ", " bir ", " bu ", " için ", " ile ", " olarak ", " daha ", " gibi ", " çok ", " sonra "),
    "id" -> Set(" yang ", " dan ", " ini ", " itu ", " dengan ", " untuk ", " tidak ", " dari ", " pada ", " adalah "),
    "vi" -> Set(" của ", " và ", " là ", " các ", " có ", " được ", " trong ", " cho ", " không ", " người "),
    "cs" -> Set(" je ", " se ", " že ", " nebo ", " který ", " jako ", " podle ", " také ", " již ", " mezi "))

  /** Unicode-script voting pre-classifier (VERDICT r02 next #6): counts
    * letters per script block and returns the dominant non-Latin script's
    * language directly — CJK/Cyrillic/Arabic/Devanagari/... pages stop
    * collapsing to "und". Latin-dominant text falls through to the trigram
    * profiles. Thresholds: ≥25% of letters non-Latin-majority script wins
    * (web pages embed Latin URLs/code, so a strict majority is too strict).
    * Han disambiguation: any kana → ja, any hangul → ko, else zh. */
  private def scriptVote(text: String): String = {
    var latin, han, kana, hangul, cyr, arab, deva, greek, hebrew, thai = 0
    var letters = 0
    var i = 0
    val n = math.min(text.length, 4096) // bounded sample — ample signal
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        val cp = c.toInt
        if (cp < 0x250) latin += 1
        else if (cp >= 0x4E00 && cp <= 0x9FFF) han += 1
        else if (cp >= 0x3040 && cp <= 0x30FF) kana += 1
        else if ((cp >= 0xAC00 && cp <= 0xD7AF) || (cp >= 0x1100 && cp <= 0x11FF)) hangul += 1
        else if (cp >= 0x400 && cp <= 0x4FF) cyr += 1
        else if ((cp >= 0x600 && cp <= 0x6FF) || (cp >= 0x750 && cp <= 0x77F)) arab += 1
        else if (cp >= 0x900 && cp <= 0x97F) deva += 1
        else if (cp >= 0x370 && cp <= 0x3FF) greek += 1
        else if (cp >= 0x590 && cp <= 0x5FF) hebrew += 1
        else if (cp >= 0xE00 && cp <= 0xE7F) thai += 1
      }
      i += 1
    }
    if (letters == 0) return null
    val cjk = han + kana + hangul
    val t = letters / 4 // 25% threshold
    if (cjk > t) {
      if (kana > 0) "ja" else if (hangul > 0) "ko" else "zh"
    }
    else if (cyr > t) "ru"
    else if (arab > t) "ar"
    else if (deva > t) "hi"
    else if (greek > t) "el"
    else if (hebrew > t) "he"
    else if (thai > t) "th"
    else null // Latin (or mixed) → trigram profiles
  }

  /** Deterministic language guess; "und" when nothing matches. The
    * stopword haystack is bounded like scriptVote's sample — a 50 MB doc
    * must not pay O(|profiles|·n) scans plus two full-size copies when the
    * first 16 KiB classifies it identically. */
  def detectLanguage(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val byScript = scriptVote(text)
    if (byScript != null) return byScript
    val sample = if (text.length <= 16384) text else text.substring(0, 16384)
    val hay = " " + sample.toLowerCase(java.util.Locale.ROOT).replaceAll("[^\\p{L}]+", " ") + " "
    var best = "und"
    var bestScore = 0
    profiles.foreach { case (lang, words) =>
      var score = 0
      words.foreach { w =>
        var idx = hay.indexOf(w)
        while (idx >= 0) { score += 1; idx = hay.indexOf(w, idx + 1) }
      }
      if (score > bestScore || (score == bestScore && score > 0 && lang < best)) {
        best = lang; bestScore = score
      }
    }
    best
  }

  // ---------- tokenization ----------

  /** Whitespace token count. */
  def wsTokenCount(text: String): Int =
    if (text == null || text.trim.isEmpty) 0 else text.trim.split("\\s+").length

  private val bpeish = java.util.regex.Pattern.compile(
    "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")

  /** BPE-ish token count: letter runs, single digits, single punctuation —
    * a deterministic proxy for subword tokenizers. */
  def bpeishTokenCount(text: String): Int = {
    if (text == null) return 0
    val m = bpeish.matcher(text)
    var n = 0
    while (m.find()) n += 1
    n
  }

  // ---------- quality scoring ----------

  final case class Quality(nChars: Int, nTokens: Int, meanTokenLen: Double,
                           punctRatio: Double, stopwordRatio: Double,
                           upperRatio: Double, digitRatio: Double,
                           score: Double)

  private val stopwords = Set("the", "and", "of", "to", "in", "is", "that",
    "it", "for", "with", "as", "on", "was", "at", "by", "an", "be", "this",
    "are", "or", "from", "not", "but", "have", "had", "has")

  /** Heuristic document quality: length / punctuation / stopword / case
    * ratios folded into [0,1]. Deterministic; tuned for webtext filtering. */
  def quality(text: String): Quality = {
    if (text == null || text.isEmpty)
      return Quality(0, 0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val n = text.length
    var punct = 0
    var upper = 0
    var digit = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      // Python-whitespace set (PyStr): entity-decoded &nbsp; must count as
      // a separator, not punctuation — Java's isWhitespace excludes U+00A0
      // and a NBSP-separated doc would otherwise score as pure junk
      if (!Character.isLetterOrDigit(c) && !graft.html.PyStr.isPyWs(c)) punct += 1
      if (Character.isUpperCase(c)) upper += 1
      if (Character.isDigit(c)) digit += 1
      i += 1
    }
    val toks = mutable.ArrayBuffer.empty[String]
    locally { // tokenize on the same Python-whitespace set
      var s = 0
      var j = 0
      while (j <= n) {
        if (j == n || graft.html.PyStr.isPyWs(text.charAt(j))) {
          if (j > s) toks += text.substring(s, j)
          s = j + 1
        }
        j += 1
      }
    }
    val nTok = toks.length
    val meanLen = if (nTok == 0) 0.0 else toks.map(_.length).sum.toDouble / nTok
    val stopRatio =
      if (nTok == 0) 0.0
      else toks.count(t => stopwords.contains(t.toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z]", ""))).toDouble / nTok
    val punctRatio = punct.toDouble / n
    val upperRatio = upper.toDouble / n
    val digitRatio = digit.toDouble / n
    // fold: reward stopwords + sane token length, punish punct/digit/upper excess
    val lenScore = math.min(1.0, nTok / 50.0)
    val tokLenScore = if (meanLen >= 3 && meanLen <= 10) 1.0 else 0.5
    val score = math.max(0.0, math.min(1.0,
      0.3 * lenScore + 0.2 * tokLenScore + 0.3 * math.min(1.0, stopRatio * 5) +
        0.2 * (1.0 - math.min(1.0, punctRatio * 4 + digitRatio * 2))))
    Quality(n, nTok, meanLen, punctRatio, stopRatio, upperRatio, digitRatio, score)
  }

  // ---------- hashing / fingerprints ----------

  /** Polynomial rolling-hash document fingerprint (deterministic, 64-bit). */
  def fingerprint(text: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < text.length) { h = 31 * h + text.charAt(i); i += 1 }
    h
  }

  /** Karp-Rabin rolling hashes of character k-grams (winnowing base). */
  def rollingHashes(text: String, k: Int): Array[Long] = {
    if (text.length < k) return Array.empty
    val B = 1000003L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    val out = new Array[Long](text.length - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + text.charAt(i); i += 1 }
    out(0) = h
    i = k
    while (i < text.length) {
      h = (h - text.charAt(i - k) * pow) * B + text.charAt(i)
      out(i - k + 1) = h
      i += 1
    }
    out
  }

  /** Winnowing (Schleimer et al.): min hash per window of w consecutive
    * k-gram hashes — the compact doc fingerprint set. */
  def winnow(text: String, k: Int = 8, w: Int = 4): Array[Long] = {
    val hs = rollingHashes(text, k)
    if (hs.isEmpty) return Array.empty
    if (hs.length <= w) return Array(hs.min)
    val picked = mutable.LinkedHashSet.empty[Long]
    var i = 0
    while (i + w <= hs.length) {
      var m = hs(i)
      var j = i + 1
      while (j < i + w) { if (hs(j) <= m) m = hs(j); j += 1 }
      picked += m
      i += 1
    }
    picked.toArray
  }

  /** Word n-gram shingles (lowercased, punctuation-stripped). */
  def shingles(text: String, n: Int): Seq[String] = {
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.length < n) {
      if (toks.isEmpty) Nil else Seq(toks.mkString(" "))
    } else
      (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))
  }

  /** Word n-grams for decontamination and repetition signals: same
    * tokenization as [[shingles]] (lowercase, `[^a-z0-9]+` splits — the
    * GPT-3/PaLM-style "sequences of alphanumeric tokens" normalization)
    * but NO short-text fallback — a doc with fewer than n words emits no
    * grams, so a 5-word page can never "match" a benchmark 13-gram. */
  def wordGrams(text: String, n: Int): Seq[String] = {
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.length < n) Nil
    else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))
  }

  // ---------- text normalization (training-corpus canonical form) ----------

  /** Canonical text form for training corpora, in a fixed order whose
    * every step is reproducible in DuckDB (the q_text_normalize oracle):
    *  1. Unicode NFC (java.text.Normalizer ≡ utf8proc `nfc_normalize` ≡
    *     CPython unicodedata — verified at codepoint level incl. the OHM
    *     SIGN singleton and combining-mark reordering);
    *  2. newline canonicalization: CRLF → LF, then lone CR → LF;
    *  3. strip C0 controls except TAB/LF, and DEL.
    * Without NFC, byte-level dedup treats "café" composed and decomposed
    * as distinct documents and n-gram matching silently misses. */
  def normalizeForTraining(text: String): String = {
    if (text == null) return null
    val nfc = java.text.Normalizer.normalize(text, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      if (c == '\r') {
        sb.append('\n')
        if (i + 1 < nfc.length && nfc.charAt(i + 1) == '\n') i += 1
      } else if ((c < 0x20 && c != '\t' && c != '\n') || c == 0x7f) {
        // dropped control
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  // ---------- repetition signals (Gopher / MassiveText-style filters) ----------

  /** Exact-integer repetition signals — the Gopher (Rae et al. 2021,
    * A1.1) repetition filters re-expressed as integer numerators and
    * denominators so the flag thresholds reduce to overflow-free integer
    * cross-multiplications (no division, no float representation drift
    * between engines):
    *  - lines/paragraphs: occurrences beyond a value's first are
    *    "duplicates"; character lengths are CODEPOINT counts (matches
    *    DuckDB `len`, not UTF-16 units);
    *  - topNChars(n) = count(most frequent word n-gram occurring ≥ 2
    *    times) × its alnum char length (0 if every gram is unique), ties
    *    broken by lexicographically smallest gram; tokChars is the total
    *    alnum char mass ([[wordGrams]] tokenization).
    * `repetitious` ORs the published thresholds: dup-line frac > 0.30,
    * dup-line chars > 0.20, same for paragraphs, top-2/3/4-gram char
    * coverage > 0.20/0.18/0.16. */
  final case class Repetition(
      nLines: Int, dupLines: Int, lineChars: Long, dupLineChars: Long,
      nParas: Int, dupParas: Int, paraChars: Long, dupParaChars: Long,
      tokChars: Long, top2Chars: Long, top3Chars: Long, top4Chars: Long,
      repetitious: Boolean)

  /** (total parts, duplicate parts, total chars, duplicate chars) over
    * non-empty parts; lengths in codepoints. */
  private def dupStats(parts: Array[String]): (Int, Int, Long, Long) = {
    val counts = mutable.HashMap.empty[String, Int]
    var n = 0
    var chars = 0L
    parts.foreach { p =>
      if (p.nonEmpty) {
        n += 1
        chars += p.codePointCount(0, p.length)
        counts.update(p, counts.getOrElse(p, 0) + 1)
      }
    }
    var dup = 0
    var dupChars = 0L
    counts.foreach { case (p, c) =>
      if (c > 1) {
        dup += c - 1
        dupChars += (c - 1).toLong * p.codePointCount(0, p.length)
      }
    }
    (n, dup, chars, dupChars)
  }

  /** Char mass of the most frequent word n-gram: count × (gram length
    * minus its n-1 joining spaces); ties → lexicographically smallest.
    * Only grams occurring ≥ 2 times qualify — a single occurrence is not
    * repetition, and without this floor every short document flags on
    * whatever long unique 3-gram it happens to contain. */
  private def topGramChars(toks: Array[String], n: Int): Long = {
    if (toks.length < n) return 0L
    val counts = mutable.HashMap.empty[String, Int]
    var i = 0
    while (i <= toks.length - n) {
      val g = toks.slice(i, i + n).mkString(" ")
      counts.update(g, counts.getOrElse(g, 0) + 1)
      i += 1
    }
    var bestGram: String = null
    var bestCnt = 1 // grams at count 1 never qualify
    counts.foreach { case (g, c) =>
      if (c > bestCnt || (c == bestCnt && bestGram != null && g < bestGram)) {
        bestGram = g; bestCnt = c
      }
    }
    if (bestGram == null) 0L
    else bestCnt.toLong * (bestGram.length - (n - 1))
  }

  def repetition(text: String): Repetition = {
    if (text == null || text.isEmpty)
      return Repetition(0, 0, 0L, 0L, 0, 0, 0L, 0L, 0L, 0L, 0L, 0L, repetitious = false)
    val (nL, dL, cL, dcL) = dupStats(text.split("\n", -1))
    val (nP, dP, cP, dcP) = dupStats(text.split("\n\n", -1))
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)
    var tokChars = 0L
    toks.foreach(tokChars += _.length) // tokens are pure ASCII [a-z0-9]
    val t2 = topGramChars(toks, 2)
    val t3 = topGramChars(toks, 3)
    val t4 = topGramChars(toks, 4)
    val flag =
      dL.toLong * 10 > nL.toLong * 3 || dcL * 5 > cL ||
      dP.toLong * 10 > nP.toLong * 3 || dcP * 5 > cP ||
      t2 * 5 > tokChars || t3 * 50 > tokChars * 9 || t4 * 25 > tokChars * 4
    Repetition(nL, dL, cL, dcL, nP, dP, cP, dcP, tokChars, t2, t3, t4, flag)
  }

  private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * 0x100000001b3L; i += 1 }
    mix64(h)
  }

  /** MinHash signature over shingles: numPerm independent permutations via
    * seeded affine rehash of one base hash (standard 1-hash trick). */
  def minhash(text: String, n: Int = 3, numPerm: Int = 64): Array[Long] =
    minhashFromShingles(shingles(text, n), numPerm)

  /** [[minhash]] over an already-tokenized shingle sequence — the shared
    * core, so a caller needing several fingerprints of one doc tokenizes
    * ONCE (shingling dominates the per-doc cost; r6 guide §1.2 "per-task
    * work"). Bitwise-identical to the text overload by construction. */
  def minhashFromShingles(sh: Seq[String], numPerm: Int): Array[Long] = {
    val sig = Array.fill(numPerm)(Long.MaxValue)
    sh.foreach { s =>
      val base = hash64(s)
      var p = 0
      while (p < numPerm) {
        val h = mix64(base + 0x9e3779b97f4a7c15L * (p + 1))
        if (h < sig(p)) sig(p) = h
        p += 1
      }
    }
    sig
  }

  /** LSH band keys: signature split into bands, each band hashed → bucket. */
  def lshBands(sig: Array[Long], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    Array.tabulate(bands) { b =>
      var h = 0xcbf29ce484222325L ^ b
      var r = 0
      while (r < rows) { h = (h ^ sig(b * rows + r)) * 0x100000001b3L; r += 1 }
      mix64(h)
    }
  }

  /** 64-bit SimHash over shingle hashes. */
  def simhash(text: String, n: Int = 3): Long =
    simhashFromShingles(shingles(text, n))

  /** [[simhash]] over pre-tokenized shingles (see [[minhashFromShingles]]). */
  def simhashFromShingles(sh: Seq[String]): Long = {
    val counts = new Array[Int](64)
    sh.foreach { s =>
      val h = hash64(s)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Exact n-gram Jaccard similarity. */
  def jaccard(a: String, b: String, n: Int = 3): Double = {
    val sa = shingles(a, n).toSet
    val sb = shingles(b, n).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val inter = sa.intersect(sb).size
      inter.toDouble / (sa.size + sb.size - inter)
    }
  }

  // ---------- vector math (similarity search) ----------

  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i); i += 1 }
    s
  }

  def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val na = norm(a)
    val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  /** Random-hyperplane LSH bucket for a vector: sign bits of seeded
    * pseudo-random projections (deterministic, no RNG object). */
  def rhpBucket(v: Array[Float], bits: Int, seed: Long): Long = {
    var out = 0L
    var b = 0
    while (b < bits) {
      var s = 0.0
      var i = 0
      while (i < v.length) {
        // deterministic pseudo-gaussian-ish weight in [-1,1)
        val w = (mix64(seed + b * 1000003L + i).toDouble / Long.MaxValue)
        s += w * v(i)
        i += 1
      }
      if (s >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** zlib-compressed size of `bytes` at the given level — the
    * compression-ratio quality signal (Gopher's repetition family: text
    * that deflates to almost nothing is template/stuffing spam; text that
    * barely deflates is encrypted/binary noise — both poor training
    * text). java.util.zip.Deflater IS zlib (same stream format, same
    * default strategy); level-6 output was verified BYTE-IDENTICAL to
    * CPython `zlib.compress(b, 6)` before the golden fixture
    * (golden/zlib_sizes.json, generator scripts/gen_zlib_golden.py) was
    * frozen, so the spec gates exact sizes, not a tolerance. Deflate
    * output is zlib-version-sensitive in principle — the fixture pins the
    * zlib 1.2/1.3 lineage both runtimes here link. Pure per-row, no
    * allocation beyond one scratch buffer; at 10^12 docs this runs as a
    * map with the usual per-row isolation. */
  def zlibCompressedSize(bytes: Array[Byte], level: Int = 6): Long = {
    val d = new java.util.zip.Deflater(level)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      n
    } finally d.end()
  }
}
