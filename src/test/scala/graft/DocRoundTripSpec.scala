package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.sources.DocLoader

/** Property round trips for the JDK-only binary extractors: for ANY text
  * the deterministic writers can encode, decode must be the exact
  * identity. Seeded ScalaCheck Gens (same pattern as TextSplitSpec — the
  * scalatest-scalacheck bridge isn't on the offline classpath) cover the
  * adversarial corners a hand-picked fixture list misses: PDF literal
  * delimiters, backslash runs, XML entities, unicode outside Latin-1,
  * control-ish whitespace, and newline placement at every position.
  */
class DocRoundTripSpec extends AnyFunSuite {

  private val charGen: Gen[String] = Gen.frequency(
    10 -> Gen.alphaNumStr.map(_.take(8)),
    3 -> Gen.oneOf("(", ")", "\\", "\\\\", "((", "))", "\\("),
    3 -> Gen.oneOf("&", "<", ">", "&amp;", "<w:t>", "]]>"),
    2 -> Gen.oneOf("é", "中文", "Ω", "🙂", "ß"),
    3 -> Gen.oneOf(" ", "\t", "\n", "\n\n"))

  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    parts <- Gen.listOfN(n, charGen)
  } yield parts.mkString

  private def samples(count: Int): Seq[String] =
    (1 to count).map(i => textGen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: docx encode→decode is the identity") {
    samples(300).foreach { t =>
      val back = DocLoader.extractDocx(DocLoader.buildDocx(t))
      assert(back == t, s"docx round trip broke for [${t.take(60)}]")
    }
  }

  test("property: pdf encode→decode is the identity, page structure intact") {
    samples(300).grouped(3).foreach { pages =>
      val got = DocLoader.extractPdfPages(DocLoader.buildPdf(pages))
      assert(got.map(_._1) == (1 to pages.size), "page numbering broke")
      assert(got.map(_._2) == pages,
        s"pdf round trip broke for pages [${pages.map(_.take(40)).mkString(" | ")}]")
    }
  }

  test("extraction status: ok / unsupported_font / parse_error routing") {
    // plain container: ok, text intact
    val (okText, okStatus) = DocLoader.extractPdfStatus(
      DocLoader.buildPdf(Seq("hello world", "page two")))
    assert(okStatus == DocLoader.StatusOk)
    assert(okText == "hello world\npage two")
    // CID/Type0 composite font WITHOUT a ToUnicode CMap: quarantined
    // with null text, never mis-decoded — the genuinely undecodable
    // class (glyph indexes, no declared Unicode mapping)
    val (t0Text, t0Status) = DocLoader.extractPdfStatus(
      DocLoader.buildPdfType0Bare(Seq("hello world", "page two")))
    assert(t0Status == DocLoader.StatusUnsupportedFont)
    assert(t0Text == null)
    // Type0 WITH a ToUnicode CMap extracts (r11: the CMapFont path)
    assert(DocLoader.extractPdfStatus(
      DocLoader.buildPdfType0(Seq("hello world", "page two"))) ==
      (("hello world\npage two", DocLoader.StatusOk)))
    // the bare-Type0 fixture still parses as a PDF for the status-less
    // path (which is exactly why status routing is needed: without it
    // the font defect is invisible)
    assert(DocLoader.extractPdfPages(DocLoader.buildPdfType0Bare(Seq("x"))) != null)
    // not a PDF at all
    val (badText, badStatus) = DocLoader.extractPdfStatus(
      "not a pdf at all".getBytes("UTF-8"))
    assert(badStatus == DocLoader.StatusParseError)
    assert(badText == null)
    assert(DocLoader.extractPdfStatus(null)._2 == DocLoader.StatusParseError)
  }

  test("property: bare-Type0 routing never depends on page content") {
    samples(60).grouped(2).foreach { pages =>
      val (t, s) = DocLoader.extractPdfStatus(DocLoader.buildPdfType0Bare(pages))
      assert(t == null && s == DocLoader.StatusUnsupportedFont,
        s"Type0 fixture leaked content for [${pages.map(_.take(30)).mkString("|")}]")
      assert(DocLoader.extractPdfStatus(DocLoader.buildPdf(pages)) ==
        ((pages.mkString("\n"), DocLoader.StatusOk)))
    }
  }

  test("property: Type0+ToUnicode encode→decode is the identity") {
    // the CMapFont path: hex CID strings under a subset-style Identity-H
    // font with a bfchar ToUnicode CMap — decode must invert exactly,
    // including multi-page structure, unicode outside Latin-1, and the
    // surrogate-pair emoji the charGen emits
    samples(120).grouped(3).foreach { pages =>
      val got = DocLoader.extractPdfPages(DocLoader.buildPdfType0(pages))
      assert(got.map(_._1) == (1 to pages.size), "page numbering broke")
      assert(got.map(_._2) == pages,
        s"Type0 round trip broke for pages [${pages.map(_.take(40)).mkString(" | ")}]")
      assert(DocLoader.extractPdfStatus(DocLoader.buildPdfType0(pages)) ==
        ((pages.mkString("\n"), DocLoader.StatusOk)))
    }
  }

  test("property: bare Type0 with an embedded font cmap decodes exactly") {
    // r13 FontFile2 fallback: NO /ToUnicode anywhere — the Unicode
    // mapping lives only in the embedded TrueType program's format-4
    // cmap, inverted at decode time (Identity-H ⇒ code = CID = GID).
    // BMP-only pages (format 4 can't carry supplementary planes; the
    // emoji class stays on the ToUnicode path).
    samples(120).grouped(3).foreach { pages0 =>
      val pages = pages0.map(t => t.codePoints().toArray.toSeq
        .filter(cp => cp == '\n' || cp <= 0xFFFE)
        .map(cp => new String(Character.toChars(cp))).mkString)
      val bytes = DocLoader.buildPdfType0Embedded(pages)
      assert(!new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
        .contains("/ToUnicode"), "fixture must be ToUnicode-free")
      val got = DocLoader.extractPdfPages(bytes)
      assert(got.map(_._1) == (1 to pages.size), "page numbering broke")
      assert(got.map(_._2) == pages,
        s"embedded-cmap round trip broke for [${pages.map(_.take(40)).mkString(" | ")}]")
      assert(DocLoader.extractPdfStatus(bytes) ==
        ((pages.mkString("\n"), DocLoader.StatusOk)))
    }
    // the TRULY bare class (no font program either) still quarantines —
    // the fallback must not have fail-opened the routing
    assert(DocLoader.extractPdfStatus(
      DocLoader.buildPdfType0Bare(Seq("still quarantined")))._2 ==
      DocLoader.StatusUnsupportedFont)
  }

  test("property: bare Type0 with an embedded CFF charset decodes exactly") {
    // r14 FontFile3 fallback (r13 verdict #6): NO /ToUnicode anywhere —
    // the Unicode mapping lives only in the embedded CFF's charset
    // glyph names (uniXXXX / uXXXXXX), inverted at decode time
    // (Identity-H + non-CID CFF ⇒ code = CID = GID). Supplementary
    // planes ride the uXXXXXX names, so no BMP filter is needed.
    samples(120).grouped(3).foreach { pages =>
      val bytes = DocLoader.buildPdfType0EmbeddedCff(pages)
      assert(!new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
        .contains("/ToUnicode"), "fixture must be ToUnicode-free")
      val got = DocLoader.extractPdfPages(bytes)
      assert(got.map(_._1) == (1 to pages.size), "page numbering broke")
      assert(got.map(_._2) == pages,
        s"CFF-charset round trip broke for [${pages.map(_.take(40)).mkString(" | ")}]")
      assert(DocLoader.extractPdfStatus(bytes) ==
        ((pages.mkString("\n"), DocLoader.StatusOk)))
    }
  }

  test("invertCffCharset: names invert, CID-keyed and malformed stay None") {
    val cff = DocLoader.buildCffWithCharset(Seq("uni0041", "uni0042", "space", "u01F600"))
    val inv = DocLoader.invertCffCharset(cff)
    assert(inv.contains(Map(1 -> "A", 2 -> "B", 3 -> " ", 4 -> "😀")))
    assert(DocLoader.invertCffCharset(Array.emptyByteArray).isEmpty)
    assert(DocLoader.invertCffCharset("not a cff at all".getBytes("UTF-8")).isEmpty)
    assert(DocLoader.invertCffCharset(cff.take(20)).isEmpty) // truncated
    // flipping the Top DICT to CID-keyed (append ROS op 12 30 is layout
    // work; instead assert the predefined-charset route) — charsetOff 0
    val pre = cff.clone()
    // Top DICT data starts after header(4) + name INDEX; its first five
    // bytes are the int5 charset offset: zero them to "predefined"
    val tdStart = {
      // header 4 bytes; name INDEX = 2(count)+1(offSize)+2(offsets)+8(data)
      4 + 2 + 1 + 2 + 8 + 2 + 1 + 2 // + topdict INDEX header = data start
    }
    for (k <- 1 to 4) pre(tdStart + k) = 0
    assert(DocLoader.invertCffCharset(pre).isEmpty, "predefined charset must stay quarantined")
  }

  test("invertTrueTypeCmap: format 4 inversion, malformed input is empty") {
    val ttf = DocLoader.buildTrueTypeWithCmap(Seq('a'.toInt -> 1, 'b'.toInt -> 2, 'é'.toInt -> 3))
    val inv = DocLoader.invertTrueTypeCmap(ttf)
    assert(inv.contains(Map(1 -> "a", 2 -> "b", 3 -> "é")))
    // present-but-empty cmap is Some(empty) — decodable, maps nothing
    assert(DocLoader.invertTrueTypeCmap(
      DocLoader.buildTrueTypeWithCmap(Seq.empty)).contains(Map.empty))
    assert(DocLoader.invertTrueTypeCmap(Array.emptyByteArray).isEmpty)
    assert(DocLoader.invertTrueTypeCmap("garbage-not-sfnt".getBytes("UTF-8")).isEmpty)
    assert(DocLoader.invertTrueTypeCmap(ttf.take(40)).isEmpty) // truncated
  }

  test("property: /Encoding /Differences encode→decode is the identity") {
    // the DiffFont path: content bytes are REMAPPED printable codes and
    // only the /Differences array (uniXXXX glyph names) can invert them —
    // a decoder ignoring the encoding would emit the wrong characters
    samples(120).grouped(3).foreach { pages0 =>
      // cap distinct code points at the writer's 94-code capacity
      val pages = pages0.map { t =>
        val keep = t.codePoints().toArray.toSeq.filter(_ != '\n').distinct.take(94).toSet
        t.codePoints().toArray.toSeq
          .filter(cp => cp == '\n' || keep.contains(cp))
          .map(cp => new String(Character.toChars(cp))).mkString
      }
      val got = DocLoader.extractPdfPages(DocLoader.buildPdfDifferences(pages))
      assert(got.map(_._2) == pages,
        s"Differences round trip broke for [${pages.map(_.take(40)).mkString(" | ")}]")
    }
    // remap actually matters: a text whose codes differ from identity
    val tricky = Seq("zyxw vu", "¡ünïcødé—ok")
    assert(DocLoader.extractPdfPages(DocLoader.buildPdfDifferences(tricky)).map(_._2) == tricky)
  }

  test("named base encoding: /WinAnsiEncoding decodes cp1252-only codes") {
    // 0x80–0x9F is exactly where WinAnsi diverges from the Latin-1
    // default: smart quotes, €, ™, — . A decoder ignoring the named
    // encoding reads those octal-escaped bytes as C1 controls.
    val pages = Seq("“smart quotes” — €99 ™", "plain ascii line")
    val got = DocLoader.extractPdfPages(DocLoader.buildPdfWinAnsi(pages))
    assert(got.map(_._2) == pages,
      s"WinAnsi round trip broke: ${got.map(_._2)}")
    assert(DocLoader.extractPdfStatus(DocLoader.buildPdfWinAnsi(pages)) ==
      ((pages.mkString("\n"), DocLoader.StatusOk)))
    // Latin-1 range decodes identically through the base table
    val latin = Seq("café naïve Ærø")
    assert(DocLoader.extractPdfPages(DocLoader.buildPdfWinAnsi(latin)).map(_._2) == latin)
  }
}
