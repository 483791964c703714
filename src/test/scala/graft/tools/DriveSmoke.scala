package graft.tools
object DriveSmoke { def main(args: Array[String]): Unit = {
import graft.clean.{Cleaner, Sanitize}
import graft.html.{HtmlParser, Serializer}
import graft.links.LinkExtractor
import graft.meta.MetadataExtractor
import graft.diff.Myers
import graft.pdf.PdfText
import graft.textstats.TextAnalysis

val page = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Spark Guide &mdash; Docs</title>
<meta name="description" content="A guide"><meta name="author" content=" Ada ">
<meta name="author" content="Linus"><meta name="modified" content="2024-03-05">
<meta property="og:title" content="Spark Guide"><link rel="canonical" href="/docs/guide/">
<link rel="stylesheet" href="/assets/site.css">
<script src="/assets/app.js"></script>
<style>.nav { display: block }</style></head>
<body><nav style="display: none"><a href="/hidden">never</a></nav>
<!-- build 1234 -->
<div class="content"><h1>Spark &amp; Scale</h1>
<p>Read   the <a href="../intro.html?utm_source=x&b=2&a=1">intro</a> first.</p>
<p>Math: $E=mc^2$ and <span class="math-inline">x&lt;y</span></p>
<pre><code>val df = spark.read.parquet("p")</code></pre>
<svg width="10"><circle r="4"/></svg>
<a href="2">2</a> <a href="next.html">Next</a>
<div></div><span>  </span></div>
<script type="application/ld+json">{"@type":"Article"}</script>
</body></html>"""
val url = "https://docs.example.com/docs/guide/index.html"
// pipeline order: parse once, extract from RAW dom, then clean in place
val rawDoc = HtmlParser.parse(page)
val meta = MetadataExtractor.extract(rawDoc)
println("META: " + meta)
val edges = LinkExtractor.edges(rawDoc, url)
edges.foreach(e => println("EDGE: " + e))
val res = Cleaner.cleanAndNormalize(page, url)
println("TEXT: [" + res.text + "]")
Sanitize.processHtmlContent(res.cleanedDoc, url)
println("CLEANED_HTML: " + Serializer.serialize(res.cleanedDoc).take(1200))
val v2 = page.replace("Read   the", "Skim the").replace("build 1234", "build 1235")
val ops = Myers.generateOps(res.text, Cleaner.cleanAndNormalize(v2, url).text)
println("DIFF_OPS: " + ops)
// PDF branch
val deflated = { val d = new java.util.zip.Deflater(); val in = "BT (Hello) Tj (PDF) ' ET".getBytes("ISO-8859-1"); d.setInput(in); d.finish(); val buf = new Array[Byte](256); val n = d.deflate(buf); buf.take(n) }
val pdf = "%PDF-1.4\n1 0 obj << /Filter /FlateDecode >>\nstream\n".getBytes("ISO-8859-1") ++ deflated ++ "\nendstream\nendobj".getBytes("ISO-8859-1")
println("PDF_IS: " + PdfText.isPdf(pdf) + " PDF_TEXT: [" + PdfText.extract(pdf) + "]")
// probes: garbage input, empty input, binary junk
println("GARBAGE: [" + Cleaner.cleanAndNormalize("<<<>>>&&&<p a=b c<d></p", "https://e.com/").text + "]")
println("EMPTY: [" + Cleaner.cleanAndNormalize("", "https://e.com/").text + "]")
val junk = Array.tabulate[Byte](64)(i => (i * 37 % 251).toByte)
println("JUNK_BYTES: [" + Cleaner.cleanAndNormalizeBytes(junk, "https://e.com/").text.take(60) + "]")
println("LANG: " + TextAnalysis.detectLanguage(res.text) + " QUALITY: " + TextAnalysis.quality(res.text).score)
println("DRIVE_DONE")
}}
