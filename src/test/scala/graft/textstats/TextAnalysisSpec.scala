package graft.textstats

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}

class TextAnalysisSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("language heuristic separates obvious cases") {
    assert(TextAnalysis.detectLanguage("the cat and the dog is in the house that it built") == "en")
    assert(TextAnalysis.detectLanguage("der Hund und die Katze ist nicht in das Haus") == "de")
    assert(TextAnalysis.detectLanguage("le chat est dans la maison avec les autres pour que") == "fr")
    assert(TextAnalysis.detectLanguage("") == "und")
    assert(TextAnalysis.detectLanguage("zzz qqq xxx") == "und")
  }

  test("broadened Latin-script profiles separate nl/pl/sv/ro/tr/id/vi/cs (r03 next #8)") {
    assert(TextAnalysis.detectLanguage(
      "dit is een pagina van het web maar dat is niet voor iedereen ook zijn er meer") == "nl")
    assert(TextAnalysis.detectLanguage(
      "to nie jest strona jak inne ale przez to się robi że do tego jest dobra") == "pl")
    assert(TextAnalysis.detectLanguage(
      "det här är en sida som är skriven på svenska och den är för test med mera av allt") == "sv")
    assert(TextAnalysis.detectLanguage(
      "aceasta este o pagină pentru test și care este din româniă mai sunt și altele după") == "ro")
    assert(TextAnalysis.detectLanguage(
      "bu bir test sayfası ve bu sayfa türkçe için daha çok örnek gibi sonra olarak yazıldı") == "tr")
    assert(TextAnalysis.detectLanguage(
      "ini adalah halaman yang ditulis dengan bahasa indonesia untuk pengujian dan tidak dari pada itu") == "id")
    assert(TextAnalysis.detectLanguage(
      "đây là trang web của chúng tôi và nó được viết cho người dùng trong các trường hợp có không") == "vi")
    assert(TextAnalysis.detectLanguage(
      "toto je stránka která se používá jako test nebo podle toho že je také již mezi jinými") == "cs")
    // the original six still win on their own text (no cross-capture)
    assert(TextAnalysis.detectLanguage(
      "el gato es una mascota para la casa con los otros del barrio") == "es")
    assert(TextAnalysis.detectLanguage(
      "o gato é uma mascote para a casa com os outros não muito longe") == "pt")
    assert(TextAnalysis.detectLanguage(
      "il gatto è una mascotte che vive per la casa con gli altri del posto e non solo") == "it")
  }

  test("script-range pre-classifier covers non-Latin families (r02 next #6)") {
    assert(TextAnalysis.detectLanguage("这是一个中文网页的正文内容测试段落") == "zh")
    assert(TextAnalysis.detectLanguage("これは日本語のページですかなカナ混じり文") == "ja")
    assert(TextAnalysis.detectLanguage("한국어 웹 페이지 본문 내용입니다") == "ko")
    assert(TextAnalysis.detectLanguage("Это страница на русском языке для теста") == "ru")
    assert(TextAnalysis.detectLanguage("هذه صفحة باللغة العربية للاختبار فقط") == "ar")
    assert(TextAnalysis.detectLanguage("यह हिन्दी भाषा का एक परीक्षण पृष्ठ है") == "hi")
    assert(TextAnalysis.detectLanguage("Αυτή είναι μια ελληνική σελίδα δοκιμής") == "el")
    assert(TextAnalysis.detectLanguage("זהו דף אינטרנט בעברית לבדיקה בלבד") == "he")
    assert(TextAnalysis.detectLanguage("นี่คือหน้าเว็บภาษาไทยสำหรับการทดสอบ") == "th")
    // mixed page: Latin boilerplate + dominant Han body still → zh
    assert(TextAnalysis.detectLanguage(
      "home login http://x.com 中文内容主体段落在这里继续延伸更多文字") == "zh")
    // Latin-dominant text still routes through the trigram profiles
    assert(TextAnalysis.detectLanguage(
      "the cat and the dog is in the house 中") == "en")
  }

  test("token counts") {
    assert(TextAnalysis.wsTokenCount("  a b   c ") == 3)
    assert(TextAnalysis.wsTokenCount("") == 0)
    assert(TextAnalysis.bpeishTokenCount("hello, world 42") == 5) // hello , world 4 2
  }

  test("quality score ranges and ordering") {
    val good = TextAnalysis.quality("The quick brown fox jumps over the lazy dog and then " +
      "it ran into the forest with many other animals that live there happily.")
    val junk = TextAnalysis.quality("@@@ ### $$$ %%% ^^^ &&& *** 123 456 789 !!!")
    assert(good.score > junk.score)
    assert(good.score >= 0.0 && good.score <= 1.0)
    assert(junk.score >= 0.0 && junk.score <= 1.0)
  }

  test("NBSP-separated text scores like space-separated text (Python whitespace set)") {
    val spaced = "The quick brown fox jumps over the lazy dog and then it ran away"
    val nbsp = spaced.replace(' ', ' ')
    val a = TextAnalysis.quality(spaced)
    val b = TextAnalysis.quality(nbsp)
    assert(b.nTokens == a.nTokens, s"${b.nTokens} vs ${a.nTokens}")
    assert(b.punctRatio == a.punctRatio)
    assert(math.abs(b.score - a.score) < 1e-9)
  }

  test("fingerprint deterministic, input-sensitive") {
    assert(TextAnalysis.fingerprint("abc") == TextAnalysis.fingerprint("abc"))
    assert(TextAnalysis.fingerprint("abc") != TextAnalysis.fingerprint("abd"))
  }

  test("winnowing: identical docs share fingerprints; disjoint docs do not") {
    val a = TextAnalysis.winnow("the quick brown fox jumps over the lazy dog", 8, 4)
    val b = TextAnalysis.winnow("the quick brown fox jumps over the lazy dog", 8, 4)
    assert(a.sameElements(b))
    val c = TextAnalysis.winnow("zzzzz yyyyy xxxxx wwwww vvvvv uuuuu", 8, 4)
    assert(a.intersect(c).isEmpty)
  }

  test("shingles") {
    assert(TextAnalysis.shingles("A b, c d", 2) == Seq("a b", "b c", "c d"))
    assert(TextAnalysis.shingles("one", 3) == Seq("one"))
    assert(TextAnalysis.shingles("", 3) == Nil)
  }

  test("minhash similarity tracks jaccard (near-dup signal)") {
    val d1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    val d2 = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    val d3 = "completely different content about spark catalyst optimizer internals"
    val s1 = TextAnalysis.minhash(d1)
    val s2 = TextAnalysis.minhash(d2)
    val s3 = TextAnalysis.minhash(d3)
    def sim(a: Array[Long], b: Array[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    assert(sim(s1, s2) > 0.5)
    assert(sim(s1, s3) < 0.2)
  }

  test("lsh bands: near-dups share at least one band; self shares all") {
    val d1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    val b1 = TextAnalysis.lshBands(TextAnalysis.minhash(d1), 16)
    val b1b = TextAnalysis.lshBands(TextAnalysis.minhash(d1), 16)
    assert(b1.sameElements(b1b))
  }

  test("simhash hamming distance small for near-dups, large for distinct") {
    val d1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    val d2 = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    val d3 = "completely different content about spark catalyst optimizer internals and shuffles"
    val h12 = TextAnalysis.hamming64(TextAnalysis.simhash(d1), TextAnalysis.simhash(d2))
    val h13 = TextAnalysis.hamming64(TextAnalysis.simhash(d1), TextAnalysis.simhash(d3))
    assert(h12 < h13)
    assert(h12 <= 16)
  }

  test("jaccard exact") {
    assert(TextAnalysis.jaccard("a b c d", "a b c d", 2) == 1.0)
    assert(TextAnalysis.jaccard("a b c", "x y z", 2) == 0.0)
  }

  test("cosine properties") {
    val v1 = Array(1f, 2f, 3f)
    val v2 = Array(2f, 4f, 6f)
    assert(math.abs(TextAnalysis.cosine(v1, v2) - 1.0) < 1e-9)
    assert(TextAnalysis.cosine(v1, Array(0f, 0f, 0f)) == 0.0)
    check(Prop.forAll(Gen.listOfN(8, Gen.chooseNum(-5f, 5f))) { l =>
      val v = l.toArray
      val c = TextAnalysis.cosine(v, v)
      TextAnalysis.norm(v) == 0.0 || math.abs(c - 1.0) < 1e-6
    })
  }

  test("rhp bucket deterministic") {
    val v = Array(0.5f, -1f, 2f, 0.1f)
    assert(TextAnalysis.rhpBucket(v, 8, 42L) == TextAnalysis.rhpBucket(v, 8, 42L))
    assert(TextAnalysis.rhpBucket(v, 8, 42L) != TextAnalysis.rhpBucket(v.map(-_), 8, 42L))
  }

  test("normalizeForTraining: NFC, newline canonicalization, control strip") {
    def cp(c: Int) = new String(Character.toChars(c))
    assert(TextAnalysis.normalizeForTraining("cafe" + cp(0x301)) == "caf" + cp(0xE9))
    assert(TextAnalysis.normalizeForTraining("a\r\nb\rc") == "a\nb\nc")
    assert(TextAnalysis.normalizeForTraining("x" + cp(7) + "\ty" + cp(0x7F)) == "x\ty")
    assert(TextAnalysis.normalizeForTraining(cp(0x2126)) == cp(0x3A9)) // OHM → Ω
    assert(TextAnalysis.normalizeForTraining(null) == null)
    assert(TextAnalysis.normalizeForTraining("plain text\nwith lines") ==
      "plain text\nwith lines")
  }

  test("repetition: duplicate line/paragraph accounting") {
    // 5 non-empty lines, "bbb" three times; paragraphs split on \n\n
    val r = TextAnalysis.repetition("aaaa\nbbb\n\nbbb\ncc\nbbb")
    assert(r.nLines == 5 && r.dupLines == 2)
    assert(r.lineChars == 4 + 3 * 3 + 2 && r.dupLineChars == 6)
    assert(r.nParas == 2 && r.dupParas == 0)
    // dup-line frac 2/5 > 0.30 → flagged
    assert(r.repetitious)
    val clean = TextAnalysis.repetition(
      "the quick brown fox\njumps over lazy dogs\n\nwhile the cat sleeps quietly today")
    assert(clean.dupLines == 0 && clean.dupParas == 0 && !clean.repetitious)
  }

  test("repetition: top n-gram char coverage and tie-breaks") {
    // "click here" ×3 among 6 tokens: top2 count 3, gram chars 9 → 27 of 28
    val r = TextAnalysis.repetition("click here click here click here end!")
    assert(r.tokChars == "clickhereclickhereclickhereend".length)
    assert(r.top2Chars == 3L * ("click here".length - 1))
    assert(r.repetitious) // 27*5 > 28
    // all-unique grams never qualify (count ≥ 2 floor)
    assert(TextAnalysis.repetition("bb cc aa").top2Chars == 0L)
    // tie at count 2 → lexicographically smallest 2-gram wins
    val t = TextAnalysis.repetition("aa bb aa bb cc dd cc dd")
    assert(t.top2Chars == 2L * 4) // "aa bb" ×2, 4 alnum chars each
    // codepoint counting: astral char counts once in line chars
    val e = TextAnalysis.repetition("ab💩")
    assert(e.nLines == 1 && e.lineChars == 3)
    // empty / null
    assert(TextAnalysis.repetition("").nLines == 0)
    assert(!TextAnalysis.repetition(null).repetitious)
  }

  test("zlibCompressedSize: EXACT CPython zlib.compress(b, 6) sizes on the " +
      "golden corpus (repetitive / prose / noise regimes)") {
    val rows = graft.GoldenJson.load("zlib_sizes.json")
    assert(rows.size >= 12)
    rows.foreach { r =>
      val text = r.get("text").asText()
      val b = text.getBytes("UTF-8")
      assert(b.length.toLong == r.get("n_bytes").asLong(), r.get("name"))
      assert(TextAnalysis.zlibCompressedSize(b) ==
        r.get("n_compressed").asLong(),
        s"${r.get("name").asText()}: deflate size diverged from CPython zlib")
    }
    // the signal separates the regimes the filter exists for
    val byName = rows.map(r => r.get("name").asText() ->
      (r.get("n_compressed").asDouble() /
        math.max(1.0, r.get("n_bytes").asDouble()))).toMap
    assert(byName("repeat_sentence") < 0.30 && byName("repeat_word") < 0.30)
    assert(byName("noise") > 0.80)
    assert(byName("prose") > 0.30 && byName("prose") < 0.80)
  }
}
